package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Optimization-round measurement harness (guide §1): for each named
  * registered query, separates DRIVER-side plan cost (analysis +
  * optimization) from execution, and counts the jobs / stages / tasks /
  * shuffle bytes the run actually scheduled — the "where is the time"
  * question VarianceProbe's single wall number cannot answer. A query
  * whose wall time is mostly `plan` needs a smaller expression tree; one
  * that is mostly `exec` across many jobs needs fewer actions; one with
  * few jobs but heavy shuffle bytes needs the §2 levers.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.OptProbe <query> [query...]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "pass query names")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
        shufWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        shufRead.addAndGet(sc.stageInfo.taskMetrics.shuffleReadMetrics.remoteBytesRead
          + sc.stageInfo.taskMetrics.shuffleReadMetrics.localBytesRead)
      }
    })

    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).write.format("noop").mode("overwrite").save())
    Tables.events(spark, dir).write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      // whole-query guard (r21, ADVICE): one bad name or runtime error must
      // not abort the probe for the remaining queries
      try probeOne(spark, dir, name, jobs, stages, tasks, shufWrite, shufRead)
      catch { case e: Throwable => System.err.println(s"[opt] $name probe failed: $e") }
    }
    spark.stop()
  }

  private def probeOne(
      spark: SparkSession, dir: String, name: String,
      jobs: AtomicInteger, stages: AtomicInteger, tasks: AtomicInteger,
      shufWrite: AtomicLong, shufRead: AtomicLong): Unit = {
    locally {
      val fn = SparkEntry.queries(name)
      // warm: codegen + scan stats for this plan
      try fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[opt] $name warmup failed: $e") }
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.queryExecution.optimizedPlan // force analysis + optimization
        val tPlan = (System.nanoTime() - t0) / 1e9
        jobs.set(0); stages.set(0); tasks.set(0); shufWrite.set(0L); shufRead.set(0L)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = (System.nanoTime() - t1) / 1e9
        // listener events are async; a short sleep drains the bus (the
        // public API has no waitUntilEmpty)
        Thread.sleep(150)
        (tPlan, tExec, jobs.get(), stages.get(), tasks.get(), shufWrite.get(), shufRead.get())
      }
      val m = reps.sortBy(r => r._1 + r._2).apply(1)
      println(f"OPT $name%-32s plan=${m._1}%6.3f exec=${m._2}%6.3f " +
        f"jobs=${m._3}%3d stages=${m._4}%3d tasks=${m._5}%5d " +
        f"shufW=${m._6 / 1024}%8dKB shufR=${m._7 / 1024}%8dKB " +
        f"reps=${reps.map(r => f"${r._1 + r._2}%.2f").mkString(",")}")
    }
  }
}
