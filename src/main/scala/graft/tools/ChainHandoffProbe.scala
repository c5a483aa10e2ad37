package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

/** Pure-JVM isolation of the AsyncProcessingSpec slowdown: 50 parallel
  * chains of 40 dependent tasks, each sleeping 2 ms, handed off through a
  * prestarted fixed pool via Future.flatMap — the exact handoff shape
  * asyncKeyedImpl builds per key. Expected ≈ 40 × 2 ms ≈ 80 ms if handoffs
  * are at memory speed; ≈ 4 s means ~100 ms per hop on this machine.
  */
object ChainHandoffProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2048)
    val pool = Executors.newFixedThreadPool(n, r => {
      val t = new Thread(null, r, "probe-io", 256 * 1024); t.setDaemon(true); t
    }).asInstanceOf[java.util.concurrent.ThreadPoolExecutor]
    val t0 = System.nanoTime()
    while (pool.prestartCoreThread()) {}
    println(f"prestart $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)

    for (rep <- 1 to 3) {
      val c0 = System.nanoTime()
      val chains = (1 to 50).map { _ =>
        (1 to 40).foldLeft(Future.unit) { (acc, _) =>
          acc.flatMap { _ => Future { Thread.sleep(2) } }
        }
      }
      Await.result(Future.sequence(chains), 60.seconds)
      println(f"rep $rep: 50 chains x 40 x 2ms: ${(System.nanoTime() - c0) / 1e9}%.3f s")
    }

    // same shape, single-hop timing histogram: time each flatMap handoff
    val h0 = System.nanoTime()
    val f = (1 to 200).foldLeft(Future.successful(System.nanoTime())) { (acc, _) =>
      acc.flatMap { _ => Future { Thread.sleep(2); System.nanoTime() } }
    }
    Await.result(f, 60.seconds)
    println(f"200-hop single chain: ${(System.nanoTime() - h0) / 1e9}%.3f s " +
      f"(${(System.nanoTime() - h0) / 200 / 1e6}%.2f ms/hop)")
  }
}
