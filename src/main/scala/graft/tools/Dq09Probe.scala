package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.PerKeyQuota
import graft.functions.cms_estimate

/** Where does dq09 (portable windowed CMS + exact join) spend its time?
  * Usage: runMain graft.tools.Dq09Probe [sfDir]
  */
object Dq09Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      body // warm
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$tag%-28s ${reps(1)}%6.2f s (reps ${reps.map(r => f"$r%.2f").mkString(",")})")
    }
    val e = Tables.events(spark, sfDir)
    time("scan") { e.write.format("noop").mode("overwrite").save() }
    time("sketch-portable") {
      PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day",
        width = 2048, depth = 4, conservative = false, portable = true)
        .write.format("noop").mode("overwrite").save()
    }
    time("sketch-murmur") {
      PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day",
        width = 2048, depth = 4, conservative = false, portable = false)
        .write.format("noop").mode("overwrite").save()
    }
    time("exact") {
      PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
        .write.format("noop").mode("overwrite").save()
    }
    time("estimate-rowwise") {
      val sketches = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day",
        width = 2048, depth = 4, conservative = false, portable = true)
      val exact = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
      exact.join(broadcast(sketches), "win")
        .select(col("win.start").cast("long").as("win_start"), col("key").as("user_id"),
          col("n").as("exact_n"),
          cms_estimate(col("sketch"), graft.functions.key_bytes(col("key")), portable = true).as("est_n"))
        .write.format("noop").mode("overwrite").save()
    }
    time("estimate-celljoin") {
      val sketches = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day",
        width = 2048, depth = 4, conservative = false, portable = true)
      val exact = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
      PerKeyQuota.estimatesPortableByCellJoin(sketches, exact, col("key"), 2048, 4)
        .select(col("win.start").cast("long").as("win_start"), col("key").as("user_id"),
          col("n").as("exact_n"), col("est_n"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
