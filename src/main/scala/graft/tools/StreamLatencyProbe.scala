package graft.tools

import org.apache.spark.sql.SparkSession

import graft.BenchMetrics

/** Rep-to-rep variance probe for the stream probe's LATENCY metrics (VERDICT
  * r3 next-round #6: avg 51→115 ms, max 124→381 ms between BENCH_r02 and
  * BENCH_r03 with identical probe code and zero GC in both windows).
  *
  * Runs the exact timed window from [[graft.Bench]] N times in one JVM and
  * prints tps / latency-avg / latency-max per rep. The latency clock starts
  * inside the per-task closure, which `AsyncProcessing.asyncKeyedImpl` invokes
  * only after the key predecessor's gate completes — so the measurand is pure
  * chain execution: 5 hops through the 1 ms hashed-wheel timer. Each hop's
  * slop is wheel-ticker scheduling delay, which under local[32] CPU
  * oversubscription (32 Spark partitions + 2048 io threads + 4 tickers on one
  * box) depends on whatever else the OS is running — the hypothesis this
  * probe tests is that avg/max latency swings rep-to-rep with no code change,
  * i.e. the r2→r3 doubling is scheduling noise, not an engine regression.
  *
  * Usage: runMain graft.tools.StreamLatencyProbe [reps]
  */
object StreamLatencyProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]").appName("stream-latency-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import scala.concurrent.Future
    import graft.streaming.AsyncProcessing.delayed

    def rep(tasks: Long, timed: Boolean): (Double, Double, Double) = {
      BenchMetrics.reset()
      val t0 = System.nanoTime()
      val n = graft.streaming.AsyncProcessing.flatMapAsyncKeyed(
        spark.range(tasks).map(i => (s"key-${i % 10000}", i))
          .repartition(32, org.apache.spark.sql.functions.col("_1")),
        maxInFlight = 512)(
        _._1,
        { t =>
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.parasitic
          val s0 = System.nanoTime()
          (1 to 5).foldLeft(Future.successful(t._2)) { (acc, _) =>
            acc.flatMap(v => delayed(4L)(v))
          }.map { v => BenchMetrics.record(System.nanoTime() - s0); v }
        }).count()
      require(n == tasks)
      val secs = (System.nanoTime() - t0) / 1e9
      val avg = if (BenchMetrics.latN.sum() == 0) 0.0
        else BenchMetrics.latSum.sum() / 1e6 / BenchMetrics.latN.sum()
      (tasks / secs, avg, BenchMetrics.latMax.get() / 1e6)
    }

    rep(5000L, timed = false) // warm-up, as in Bench
    (1 to reps).foreach { i =>
      val (tps, avg, max) = rep(50000L, timed = true)
      println(f"LATREP $i tps=$tps%.0f lat_avg_ms=$avg%.1f lat_max_ms=$max%.1f")
    }
    spark.stop()
  }
}
