package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions._

/** Scratch bisect of pq88's funnel cost (not part of the driver contract). */
object Pq88Bisect {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
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
    val toks = split(col("text"), " ")
    val nLines = ((size(toks) + 5) / 6).cast("int")
    val lines0 = transform(sequence(lit(0), nLines - 1),
      i => array_join(slice(toks, i * 6 + 1, lit(6)), " "))
    val punct = transform(lines0, (l, i) =>
      when(i % 3 === 2, l).otherwise(concat(l, lit("."))))
    val withJs = when(id % 7 === 0, concat(
        array(lit("You must enable JavaScript to view this page.")), punct)).otherwise(punct)
    val withBrace = when(id % 11 === 0,
        concat(withJs, array(lit("if (x) { return; }")))).otherwise(withJs)
    val withLorem = when(id % 13 === 0, concat(withBrace,
        array(lit("Lorem ipsum dolor sit amet consectetur adipiscing elit."))))
      .otherwise(withBrace)
    val blocked = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row("tracker.biz")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(
          "domain", org.apache.spark.sql.types.StringType))))
    val in = d.withColumn("url", url).withColumn("body", array_join(withLorem, "\n"))
    val gopher = graft.quality.GopherRules.Params(minWords = 10L, minStopWords = 1L)

    def time(label: String, mk: => DataFrame): Unit = {
      mk.write.format("noop").mode("overwrite").save() // warm
      val reps = Seq.fill(3) {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bisect] $label: ${reps.map(r => f"$r%.2f").mkString(", ")}")
    }

    // A: url tier only (dedup election + blocklist flags, no text stages)
    time("A url-tier-only", {
      val withHash = in.select(id.as("__id"), col("body").as("__text"),
        url_canonicalize(col("url")).as("canon_url"))
        .withColumn("__uh", md5(col("canon_url")))
      val keepers = withHash.groupBy(col("__uh")).agg(min(col("__id")).as("__keep_id"))
        .select(col("__uh").as("__kuh"), col("__keep_id"))
      val blockedB = broadcast(blocked.toDF("__bd").dropDuplicates("__bd"))
      withHash.join(keepers, col("__uh") === col("__kuh"), "left")
        .withColumn("__keeper", col("__id") === col("__keep_id"))
        .withColumn("__domain", url_domain(col("canon_url")))
        .join(blockedB, col("__domain") === col("__bd"), "left")
        .withColumn("__pass2", col("__keeper") && col("__bd").isNull)
        .agg(count(lit(1)).as("n_raw"),
          count(when(col("__keeper"), 1)).as("n_url_unique"),
          count(when(col("__pass2"), 1)).as("n_unblocked"))
    })

    // B: current crawlFunnel
    time("B current-funnel", graft.pipeline.WebCuration.crawlFunnel(
      in, id, col("url"), col("body"), blocked, gopher = gopher))

    // C: C4+Gopher on ALL rows, no join/flags (text tier alone)
    time("C text-tier-all-rows", {
      val g = graft.quality.GopherRules.withMetricsAndFlags(
        graft.quality.C4Rules.withClean(in.select(col("body").as("__t")), col("__t"),
          graft.quality.C4Rules.Params(), "__c4"),
        col("__c4.clean_text"), gopher, "__gm", "__gf")
      g.agg(count(when(col("__c4.page_keep"), 1)).as("c4"),
        count(when(col("__c4.page_keep") && col("__gf.gopher_keep"), 1)).as("g"))
    })

    spark.stop()
  }
}
// Round-18 result (sf0.1, local[32], same-JVM reps):
//   A url-tier-only (old self-join shape): 1.21-1.67 s  <- TWO canonicalize passes
//   C text-tier-all-rows:                  0.86-1.16 s
//   B crawlFunnel BEFORE:  2.16-2.68 s (idn_ascii x2 in executed plan)
//   B crawlFunnel AFTER:   1.15-1.59 s (idn_ascii x1, single-agg join shape)
// The url tier alone cost more than the whole text tier because the
// election self-join paid the canonicalize chain once per side; the fix
// (narrow one-pass election + lossless id join-back + one aggregation)
// halves the chain cost and removed the divergent-pruning double plan.
