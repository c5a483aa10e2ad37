package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Percentiles

/** Quantifies the q21 trade at larger scale: the distributed two-pass exact
  * rank selection vs the builtin `percentile` aggregate (per-group value map
  * on the reducers — the scale hazard) vs the `approx_percentile` twin.
  * Also reports the builtin's peak per-group distinct-value count, the
  * number that grows with data and eventually breaks the builtin's buffer.
  * Usage: runMain graft.tools.PercentileCrossoverProbe [sfDir] [reps]
  */
object PercentileCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]").appName("pct-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.events(spark, dir)
    e.write.format("noop").mode("overwrite").save()
    val ps = Seq(0.1, 0.5, 0.9, 0.99)

    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Double = {
      mk.write.format("noop").mode("overwrite").save() // warm (codegen + JIT)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$name%-10s median ${ts(reps / 2)}%.3f s  reps ${ts.mkString(", ")}")
      ts(reps / 2)
    }

    val distincts = e.groupBy(col("event_type"))
      .agg(countDistinct(col("value")).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    println(s"peak per-group distinct values (builtin's buffer size): $distincts")

    time("exact")(Percentiles.exactGroupPercentiles(e, col("event_type"), col("value"), ps))
    time("builtin")(e.groupBy(col("event_type"))
      .agg(percentile(col("value"), array(ps.map(lit(_)): _*)).as("pcts")))
    time("approx")(Percentiles.approxGroupPercentiles(e, col("event_type"), col("value"), ps))
    spark.stop()
  }
}
