package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.streaming.AsyncProcessing

object AsyncProcessingSpec {
  val inFlight = new ConcurrentHashMap[String, AtomicBoolean]()
  val violations = new AtomicInteger(0)
  def guard(key: String)(body: => Unit): Unit = {
    val g = inFlight.computeIfAbsent(key, _ => new AtomicBoolean(false))
    if (!g.compareAndSet(false, true)) violations.incrementAndGet()
    try body finally g.set(false)
  }
}

class AsyncProcessingSpec extends SparkTestBase {

  test("async keyed map overlaps I/O across keys but stays serial within a key") {
    import spark.implicits._
    AsyncProcessingSpec.violations.set(0)
    AsyncProcessingSpec.inFlight.clear()
    val n = 2000
    val tasks = spark.range(n.toLong).map(i => (s"key-${i % 50}", i))
      .repartition(4, org.apache.spark.sql.functions.col("_1")) // O2: key -> partition
    tasks.count() // warm the session/shuffle outside the timed region

    val t0 = System.nanoTime()
    val out = AsyncProcessing.mapAsyncKeyed(tasks, maxInFlight = 64)(
      _._1,
      { case (k, i) =>
        AsyncProcessingSpec.guard(k)(Thread.sleep(2))
        (k, i * 2)
      }).collect()
    val secs = (System.nanoTime() - t0) / 1e9

    assert(out.length == n)
    assert(AsyncProcessingSpec.violations.get() == 0, "same-key tasks ran concurrently")
    // serial execution would take >= n*2ms = 4s of sleep; overlap must beat it
    assert(secs < 3.0, f"no I/O overlap: $secs%.1fs for ${n} x 2ms tasks")
  }

  test("flatMapAsyncKeyed (true-async) keeps per-key serialism and delivers all") {
    import spark.implicits._
    import scala.concurrent.Future
    AsyncProcessingSpec.violations.set(0)
    AsyncProcessingSpec.inFlight.clear()
    val n = 1000
    val tasks = spark.range(n.toLong).map(i => (s"key-${i % 20}", i))
      .repartition(4, org.apache.spark.sql.functions.col("_1"))
    val out = AsyncProcessing.flatMapAsyncKeyed(tasks, maxInFlight = 128)(
      _._1,
      { t =>
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.parasitic
        AsyncProcessing.delayed(2L)(()).map { _ =>
          AsyncProcessingSpec.guard(t._1)(())
          t._2
        }
      }).collect()
    assert(out.length == n)
    assert(out.toSet == (0L until n.toLong).toSet)
    assert(AsyncProcessingSpec.violations.get() == 0)
  }

  test("async keyed map preserves input order within a partition") {
    import spark.implicits._
    val tasks = spark.range(500).map(i => (s"k${i % 7}", i))
      .repartition(2, org.apache.spark.sql.functions.col("_1"))
    // record per-partition input order, compare to output order
    val inOrder = tasks.mapPartitions(it => it.map(_._2)).collect().toSeq
    val outOrder = AsyncProcessing.mapAsyncKeyed(tasks, 32)(_._1, t => t._2).collect().toSeq
    assert(outOrder == inOrder)
  }
}
