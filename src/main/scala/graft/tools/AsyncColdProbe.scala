package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession

/** Diagnostic for the AsyncProcessingSpec cold-start failure on this
  * container class: replicates the spec body and records the max number of
  * concurrently-sleeping tasks plus phase timings.
  */
object AsyncColdProbe {
  val cur = new AtomicInteger(0)
  val max = new AtomicInteger(0)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("async-cold-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = 2000
    val tasks = spark.range(n.toLong).map(i => (s"key-${i % 50}", i))
      .repartition(4, org.apache.spark.sql.functions.col("_1"))
    tasks.count()
    val t0 = System.nanoTime()
    val out = graft.streaming.AsyncProcessing.mapAsyncKeyed(tasks, maxInFlight = 64)(
      _._1,
      { case (k, i) =>
        val c = cur.incrementAndGet()
        max.accumulateAndGet(c, math.max)
        Thread.sleep(2)
        cur.decrementAndGet()
        (k, i * 2)
      }).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"n=${out.length} secs=$secs%.3f maxConcurrentSleeps=${max.get()}")
    spark.stop()
  }
}
