package graft.tools

import org.apache.spark.sql.SparkSession

/** Standalone stream-throughput probe for interleaved A/B runs across two
  * checkouts (the methodology [[NoiseAb]] applies to batch queries, here for
  * the STREAM probe: r14's 74.6k→64.0k tasks/s drift question). The workload
  * is byte-for-byte [[graft.Bench]]'s stream probe — five sequential 4 ms
  * async I/Os per task through `AsyncProcessing.flatMapAsyncKeyed` — minus
  * the 135-query batch suite in front of it, so one JVM run costs ~30 s and
  * alternating A/B runs land inside the same box-noise window. The file is
  * self-contained (no Bench dependency) so it can be dropped verbatim into
  * an older checkout that predates it. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.StreamAb [label] [reps]
  * Prints one JSON line: {"probe":"stream-ab","label":…,"median_tps":…,"reps_tps":[…]}
  */
object StreamAb {
  def main(args: Array[String]): Unit = {
    val label = args.headOption.getOrElse("head")
    val nReps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import scala.concurrent.Future
    import graft.streaming.AsyncProcessing.delayed

    // untimed warm-up: ioPool threads, wheel tickers, mapPartitions codegen
    graft.streaming.AsyncProcessing.flatMapAsyncKeyed(
      spark.range(5000L).map(i => (s"key-${i % 1000}", i))
        .repartition(32, org.apache.spark.sql.functions.col("_1")),
      maxInFlight = 512)(
      _._1,
      { t =>
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.parasitic
        delayed(4L)(t._2)
      }).count()

    val streamTasks = 50000L
    def rep(): Double = {
      val t0 = System.nanoTime()
      val n = graft.streaming.AsyncProcessing.flatMapAsyncKeyed(
        spark.range(streamTasks).map(i => (s"key-${i % 10000}", i))
          .repartition(32, org.apache.spark.sql.functions.col("_1")),
        maxInFlight = 512)(
        _._1,
        { t =>
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.parasitic
          (1 to 5).foldLeft(Future.successful(t._2)) { (acc, _) =>
            acc.flatMap(v => delayed(4L)(v))
          }
        }).count()
      require(n == streamTasks)
      streamTasks / ((System.nanoTime() - t0) / 1e9)
    }
    val reps = Seq.fill(nReps)(rep())
    val med = reps.sorted.apply((reps.size - 1) / 2)
    // Locale-independent (f"" uses the default locale; comma decimals would
    // make the line invalid JSON under e.g. de_DE).
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(s"""{"probe":"stream-ab","label":"$label","median_tps":${num(med)},"reps_tps":${reps.map(num).mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
