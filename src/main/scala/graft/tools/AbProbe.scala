package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Same-JVM interleaved A/B of two plan variants (r20 optimization loop):
  * warms both, then alternates A,B,A,B,... so box drift hits both arms
  * equally; reports per-arm medians. Edit the variants in place for the
  * question at hand — this is a scratch measurement harness, not a
  * registered surface.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "embeddings").foreach(t =>
      Tables.table(spark, dir, t).write.format("noop").mode("overwrite").save())

    def variantA(): DataFrame = {
      val d = Tables.documents(spark, dir)
      graft.pipeline.Curation.scrubAndMix(
        d, col("doc_id"), col("text"), col("source"), col("lang"),
        segTokens = 4, spanTokens = 5,
        keepFrac = 0.7, cap = 10, alpha = "prop", budget = 90L)
    }
    def variantB(): DataFrame = {
      val d = Tables.spreadForRowWork(Tables.documents(spark, dir))
      graft.pipeline.Curation.scrubAndMix(
        d, col("doc_id"), col("text"), col("source"), col("lang"),
        segTokens = 4, spanTokens = 5,
        keepFrac = 0.7, cap = 10, alpha = "prop", budget = 90L)
    }
    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(variantA _); time(variantB _) // warm both
    val (as, bs) = (1 to 5).map(_ => (time(variantA _), time(variantB _))).unzip
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"AB A=${med(as)}%.3f (${as.map(x => f"$x%.2f").mkString(",")}) " +
      f"B=${med(bs)}%.3f (${bs.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }
}
