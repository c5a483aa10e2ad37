package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** One-off: isolate the per-row cost of the url_canonicalize chain forms —
  * steps 1-6 alone vs the full 1-8 chain — on pq83's synthetic URLs at
  * sf0.1 volume, to attribute the round-17 crawl-family bench delta.
  */
object CanonCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val id = col("doc_id")
    val url = when(id % 4 === 0, concat(
        lit("https://WWW.News.Example.CO.UK:443/Story/"), id,
        lit("/?utm_source=rss&utm_medium=feed")))
      .when(id % 4 === 1, concat(
        lit("HTTP://Blog.Example.COM:80/posts/"), id % 50,
        lit("?id="), id % 50, lit("&fbclid=abc"), id, lit("#section2")))
      .when(id % 4 === 2, concat(
        lit("https://spam.tracker.biz/offer/"), id % 10, lit("/")))
      .otherwise(concat(
        lit("https://docs.example.com/guide?page="), id % 20,
        lit("&utm_campaign=x&ref_src=tw")))
    val base = d.select(url.as("u")).localCheckpoint()

    def steps16(u: Column): Column = {
      import graft.functions.UrlFunctions._
      val noFrag  = regexp_replace(trim(u), "#.*$", "")
      val lowered = concat(
        lower(regexp_extract(noFrag, AuthorityPrefixRe, 0)),
        regexp_replace(noFrag, AuthorityPrefixRe, ""))
      val noWww   = regexp_replace(lowered, "^(https?://)www\\.", "$1")
      val noPort  = regexp_replace(
        regexp_replace(noWww, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2"),
        "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
      val noTrack   = regexp_replace(noPort, TrackingParamRe, "$1")
      val collapsed = regexp_replace(noTrack, "([?&])&+", "$1")
      val noTail    = regexp_replace(collapsed, "[?&]+$", "")
      regexp_replace(regexp_replace(noTail, "/+\\?", "?"), "/+$", "")
    }

    def time(label: String, c: Column): Unit = {
      // warm once, then median-ish of 3
      base.select(md5(c).as("h")).agg(count(lit(1))).collect()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        base.select(md5(c).as("h")).agg(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[canon] $label%-12s ${ts(1)}%6.3f s (${ts.mkString(", ")})")
    }
    time("steps1-6", steps16(col("u")))
    time("full1-8", graft.functions.UrlFunctions.url_canonicalize(col("u")))
    time("md5-only", col("u"))

    // r20: the pq91 shape — every row carries '%', so the full chain takes
    // the slow branch (percent_normalize + steps3to7 + idn_host_fold).
    // Time each sub-chain alone to attribute the per-row cost.
    val did = col("doc_id")
    val urlPct = concat(lit("https://Site"), did % 7,
      lit(".Example.COM/p%7Ev/a%2Fb%3a/"), did, lit("?id="), did)
    val basePct = d.select(urlPct.as("u")).localCheckpoint()
    def timeOn(b: org.apache.spark.sql.DataFrame, label: String, c: Column): Unit = {
      b.select(md5(c).as("h")).agg(count(lit(1))).collect()
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        b.select(md5(c).as("h")).agg(count(lit(1))).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[canon] $label%-16s ${ts(1)}%6.3f s (${ts.mkString(", ")})")
    }
    import graft.functions.UrlFunctions
    timeOn(basePct, "pct/md5-only", col("u"))
    timeOn(basePct, "pct/pctnorm", UrlFunctions.percent_normalize(col("u")))
    timeOn(basePct, "pct/steps3to7", steps16(col("u")))
    timeOn(basePct, "pct/idnfold", UrlFunctions.idn_host_fold(col("u")))
    timeOn(basePct, "pct/full", UrlFunctions.url_canonicalize(col("u")))
    spark.stop()
  }
}
