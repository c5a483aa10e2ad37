package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Stage-by-stage cold-cost profile of the pq74 scrub-and-mix flagship
  * (cumulative timings: each stage includes its upstreams). The round-11
  * reassembly rework was driven by this probe — span removal's per-token
  * explode → join → sorted-collect chain was 11.7 s of the 16.8 s cold
  * total at sf0.1; the native row-local merge-scan halved the cold run.
  * Usage: runMain graft.tools.Pq74Probe [sfDir]
  */
object Pq74Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$tag%-18s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val d = Tables.documents(spark, sfDir)
    time("scan") { d.write.format("noop").mode("overwrite").save() }
    val base = d.select(col("doc_id"), col("source"), col("lang").as("stratum"), col("text"))
    val rep = TextFunctions.dropRepeatedSegments(base, col("doc_id"), col("text"), 4)
      .select(col("doc_id"), col("text_clean").as("text"))
    time("repetition") { rep.write.format("noop").mode("overwrite").save() }
    val spans = graft.dedup.Dedup.removeDuplicatedSpans(rep, col("doc_id"), col("text"), 5)
      .filter(length(col("text_clean")) > 0)
      .select(col("doc_id"), col("text_clean").as("text"))
    time("spans(cum)") { spans.write.format("noop").mode("overwrite").save() }
    val meta = base.select(col("doc_id"), col("source"), col("stratum"))
    val scrubbed = spans.join(meta, "doc_id")
    time("scrub-join(cum)") { scrubbed.write.format("noop").mode("overwrite").save() }
    time("full-pq74-cold") {
      graft.pipeline.Curation.releaseStageCaches(blocking = true)
      spark.catalog.clearCache()
      graft.pipeline.Curation.scrubAndMix(
        d, col("doc_id"), col("text"), col("source"), col("lang"),
        4, 5, 0.7, 10, "prop", 90L).write.format("noop").mode("overwrite").save()
    }
    time("full-pq74-cold2") {
      graft.pipeline.Curation.releaseStageCaches(blocking = true)
      spark.catalog.clearCache()
      graft.pipeline.Curation.scrubAndMix(
        d, col("doc_id"), col("text"), col("source"), col("lang"),
        4, 5, 0.7, 10, "prop", 90L).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
