package graft

import org.apache.spark.sql.functions._

import graft.retrieval.Bm25

/** BM25 retrieval: checked against an independent in-memory scorer (plain
  * Scala, no Spark) on a hand-built corpus, plus partition-invariance and
  * contract checks. The sf-corpus hash-exactness vs DuckDB is pq53's job.
  */
class Bm25Spec extends SparkTestBase {

  private val corpus = Seq(
    (1L, "spark shuffles data across the cluster"),
    (2L, "spark spark spark everywhere spark"),
    (3L, "the cluster runs a big data job"),
    (4L, "a tiny doc"),
    (5L, "data data cluster data spark data"),
    (6L, "completely unrelated words only here"))

  /** Reference scorer: same algorithm, written independently of the Spark
    * expression tree (plain doubles, then the same 1e6 floor freeze).
    */
  private def reference(
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Seq[(Long, Int, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def df(term: String) = toks.values.count(_.contains(term))
    def idf(term: String) =
      math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0)
    queries.flatMap { case (qid, terms) =>
      val scored = toks.toSeq.flatMap { case (id, ts) =>
        val comps = terms.map { term =>
          val tf = ts.count(_ == term).toDouble
          if (tf == 0) 0L
          else math.floor(1e6 * idf(term) *
            (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * ts.size / avgdl)))).toLong
        }
        if (terms.exists(t => ts.contains(t))) Some((id, comps.sum)) else None
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s), i) => (qid, i + 1, id, s)
      }
    }
  }

  test("bm25TopK matches an independent reference scorer, any partitioning") {
    import spark.implicits._
    val queries = Seq(1L -> Seq("spark", "data"), 2L -> Seq("cluster"),
      3L -> Seq("tiny", "job"))
    val expected = reference(queries, k = 3)
    for (parts <- Seq(1, 3, 7)) {
      val df = corpus.toDF("doc_id", "text").repartition(parts)
      val got = Bm25.bm25TopK(df, col("doc_id"), col("text"), queries, k = 3)
        .select("qid", "rank", "doc_id", "score_fp")
        .as[(Long, Int, Long, Long)].collect().toSeq
        .sortBy(r => (r._1, r._2))
      assert(got == expected, s"parts=$parts")
    }
  }

  test("bm25TopK: repeated terms score higher than absent, ranks are dense") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    val out = Bm25.bm25TopK(df, col("doc_id"), col("text"),
      Seq(9L -> Seq("spark")), k = 10).collect()
    // only docs containing "spark" appear, doc 2 (tf=4... highest tf) first
    assert(out.map(_.getLong(2)).toSet == Set(1L, 2L, 5L))
    assert(out.head.getLong(2) == 2L)
    assert(out.map(_.getInt(1)).toSeq == (1 to out.length))
    // score is the fixed-point value recovered by one IEEE division
    out.foreach(r => assert(r.getDouble(4) == r.getLong(3).toDouble / 1e6))
  }

  test("bm25TopK input validation") {
    import spark.implicits._
    val df = corpus.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25.bm25TopK(df, col("doc_id"), col("text"), Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Bm25.bm25TopK(df, col("doc_id"), col("text"), Seq(1L -> Seq("a")), k = 0)
    }
    intercept[IllegalArgumentException] {
      Bm25.bm25TopK(df, col("doc_id"), col("text"), Seq(1L -> Seq.empty), k = 1)
    }
  }
}
