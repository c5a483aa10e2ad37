package graft

import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.sampling.Sampling

/** Randomized cross-checks for the round-4 pipeline operators: each Spark
  * operator is compared against an independent in-memory Scala
  * implementation on seeded random corpora (same style as BrokerLogSpec's
  * randomized round-trip). The DuckDB oracle already pins these at sf0.01;
  * these runs cover shapes the synthetic corpus doesn't produce — empty
  * docs, single tokens, heavy repeats, every-doc-identical.
  */
class PipelinePropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(20260812L)

  /** Random corpus over a tiny vocabulary (forces shared windows/tokens). */
  private def randomCorpus(nDocs: Int, vocab: Int, maxLen: Int): Seq[(Long, String)] =
    (1L to nDocs.toLong).map { id =>
      val len = rnd.nextInt(maxLen + 1) // 0 ⇒ empty text
      id -> Seq.fill(len)(s"w${rnd.nextInt(vocab)}").mkString(" ")
    }

  private def toks(text: String): Vector[String] = text.split(" ", -1).toVector

  // --- duplicatedSpanStats vs brute force ----------------------------------

  private def bruteSpans(corpus: Seq[(Long, String)], n: Int): Map[Long, (Long, Long)] = {
    def grams(text: String): Vector[String] = {
      val t = toks(text)
      (0 to math.max(t.size - n, 0)).map(i => t.slice(i, i + n).mkString(" ")).toVector
    }
    val byDoc = corpus.map { case (id, tx) => id -> grams(tx) }
    val df = byDoc.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    byDoc.map { case (id, gs) =>
      id -> (gs.size.toLong, gs.count(g => df(g) > 1).toLong)
    }.toMap
  }

  test("duplicatedSpanStats matches brute force on random tiny-vocab corpora") {
    for (round <- 1 to 3) {
      val corpus = randomCorpus(nDocs = 40, vocab = 4, maxLen = 12)
      val got = Dedup.duplicatedSpanStats(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 3)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === bruteSpans(corpus, 3), s"round $round")
    }
  }

  test("duplicatedSpanStats: identical docs are 100% duplicated spans") {
    val corpus = (1L to 5L).map(_ -> "a b c d e f g")
    val out = Dedup.duplicatedSpanStats(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), n = 4)
      .collect()
    assert(out.length == 5 && out.forall(r => r.getLong(1) == 4L && r.getLong(2) == 4L))
  }

  // --- stratifiedByHash vs local md5 ---------------------------------------

  private def localBucket(id: Long): Long = {
    val hex = MessageDigest.getInstance("MD5").digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1000
  }

  test("stratifiedByHash selection equals the local md5-threshold computation") {
    val rows = (1L to 500L).map(id => (id, s"s${id % 7}"))
    val rates = Map("s0" -> 0, "s1" -> 1000, "s2" -> 333, "s3" -> 999)
    val got = Sampling.stratifiedByHash(
        rows.toDF("doc_id", "stratum"), col("doc_id"), col("stratum"),
        rates, defaultPerMille = 500)
      .select("doc_id").as[Long].collect().toSet
    val expect = rows.filter { case (id, s) =>
      localBucket(id) < rates.getOrElse(s, 500)
    }.map(_._1).toSet
    assert(got === expect)
    assert(!got.exists(_ % 7 == 0), "rate-0 stratum must be empty")
    assert((1L to 500L).filter(_ % 7 == 1).forall(got), "rate-1000 stratum keeps all")
  }

  // --- topTerms vs brute force ---------------------------------------------

  private def bruteTopTerms(corpus: Seq[(Long, String)], k: Int): Set[(Long, Int, String, Long, Long)] = {
    val tf = corpus.flatMap { case (id, tx) => toks(tx).map(t => (id, t)) }
      .groupBy(identity).map { case ((id, t), xs) => (id, t, xs.size.toLong) }
    val df = tf.groupBy(_._2).map { case (t, xs) => t -> xs.size.toLong }
    tf.groupBy(_._1).flatMap { case (id, terms) =>
      terms.toSeq
        .map { case (_, t, c) => (t, c, df(t)) }
        .sortBy { case (t, c, d) => (-c, d, t) }
        .take(k).zipWithIndex
        .map { case ((t, c, d), i) => (id, i + 1, t, c, d) }
    }.toSet
  }

  test("topTerms matches brute force on random corpora") {
    for (round <- 1 to 3) {
      val corpus = randomCorpus(nDocs = 30, vocab = 6, maxLen = 15)
      val got = TextFunctions.topTerms(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), k = 3)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got === bruteTopTerms(corpus, 3), s"round $round")
    }
  }

  // --- chunkByTokens reconstruction ----------------------------------------

  test("chunks reconstruct the document exactly (overlap stripped) for random sizes") {
    for (_ <- 1 to 3) {
      val chunkSize = 2 + rnd.nextInt(6)
      val overlap = rnd.nextInt(chunkSize)
      val corpus = randomCorpus(nDocs = 25, vocab = 50, maxLen = 40)
      val chunks = TextFunctions.chunkByTokens(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), chunkSize, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector).toMap
      corpus.foreach { case (id, text) =>
        val cs = chunks(id)
        val rebuilt = (cs.head.split(" ", -1).toVector +:
          cs.tail.map(_.split(" ", -1).toVector.drop(overlap))).flatten
        assert(rebuilt === toks(text), s"doc $id failed to reconstruct")
        // no chunk exceeds chunkSize; the first is full whenever the doc is
        val lens = cs.map(_.split(" ", -1).length)
        assert(lens.forall(_ <= chunkSize))
        assert(lens.head == math.min(chunkSize, toks(text).size))
      }
    }
  }
}
