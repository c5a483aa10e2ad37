package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.config._

class FilePropertySpec extends AnyFunSuite {

  test("file supplier provides typed values and hot-reloads bound properties (P3)") {
    val f = Files.createTempFile("graft-props", ".conf")
    Files.writeString(f, "decaton.processing.rate.per.partition=100\n# comment\ndecaton.ignore.keys=a,b\n")
    val supplier = new FilePropertySupplier(f, pollMillis = 50L)
    try {
      val props = new Properties(Seq(supplier))
      assert(props.resolve(EngineProperties.ProcessingRate) == 100L)
      assert(props.resolve(EngineProperties.IgnoreKeys) == Seq("a", "b"))
      assert(props.resolve(EngineProperties.CommitIntervalMs) == 1000L) // default

      // hot reload drives a bound dynamic property
      val dyn = props.dynamic(EngineProperties.ProcessingRate)
      @volatile var observed = List.empty[(Long, Long)]
      dyn.onChange((o, n) => observed ::= (o, n))
      supplier.bind(dyn)
      assert(dyn.value == 100L)

      Files.writeString(f, "decaton.processing.rate.per.partition=0\n")
      val deadline = System.currentTimeMillis() + 5000
      while (dyn.value != 0L && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(dyn.value == 0L, "file change did not propagate")
      assert(observed.contains((100L, 0L)))
    } finally supplier.close()
  }
}
