package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Rep-to-rep variance probe for registered queries: warms tables + plans,
  * then times N reps of each named query. Used to separate real plan
  * regressions from single-shot timing noise in the per-round bench (e.g.
  * q17's r2 "0.64 → 1.11 s" read 0.41–0.48 s across 6 warmed reps — noise).
  *
  * Usage: runMain graft.tools.VarianceProbe <sfDir> [queryName...]
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q17_json_extract", "q01_pricing_summary", "q18_having")
    val spark = SparkSession.builder()
      .master("local[32]").appName("variance-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      // mirror the Bench session: without this the default 100-entry Janino
      // LRU recompiles every stage of multi-plan queries on every rep
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings")
      .foreach(t => Tables.table(spark, dir, t).write.format("noop").mode("overwrite").save())
    Tables.events(spark, dir).write.format("noop").mode("overwrite").save()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm-up
      val reps = (1 to 6).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"VARIANCE $name reps=${reps.map(r => f"$r%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
