package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** BPE: the native greedy-loop encoder against an independent reference
  * implementation (including the case where a merge creates a new
  * occurrence of an EARLIER-rank pair — the one a single rank-ordered pass
  * gets wrong), deterministic training, and corpus-level compression.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: straightforward greedy BPE over one word. */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.toCharArray.map(_.toString).toSeq
    var continue = syms.size >= 2
    while (continue) {
      val present = syms.zip(syms.drop(1)).flatMap(rank.get)
      if (present.isEmpty) continue = false
      else {
        val (a, b) = merges(present.min)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
          else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
        continue = syms.size >= 2
      }
    }
    syms
  }

  private def encodeOne(text: String, merges: Seq[(String, String)]): Seq[Seq[String]] =
    Seq(text).toDF("t")
      .select(graft.functions.bpe_subwords(col("t"), merges).as("ws"))
      .as[Seq[Seq[String]]].head()

  test("native encoder matches the reference, including re-created earlier-rank pairs") {
    // "abc" with ranks [(ab,c) < (a,b)]: merging (a,b) first CREATES the
    // rank-0 pair — greedy must end at one token; a rank-ordered single
    // pass would stop at [ab, c]
    val tricky = Seq(("ab", "c"), ("a", "b"))
    assert(encodeOne("abc", tricky) == Seq(Seq("abc")))
    assert(refEncode("abc", tricky) == Seq("abc"))
    // overlap: non-overlapping left-to-right
    val aa = Seq(("a", "a"))
    assert(encodeOne("aaaaa", aa) == Seq(Seq("aa", "aa", "a")))
    // multi-word, empty word, unicode (surrogate pair stays one symbol)
    val m = Seq(("t", "h"), ("th", "e"))
    val out = encodeOne("the  théâtre 😀x", m)
    assert(out(0) == Seq("the"))
    assert(out(1) == Seq.empty) // double space ⇒ empty word, zero symbols
    assert(out(3) == Seq("😀", "x"))
    // fuzz against the reference on real corpus text
    val docs = Tables.documents(spark, sfDir).select("text").as[String].take(20)
    val merges = Bpe.trainMerges(Tables.documents(spark, sfDir), col("text"), 12)
    docs.foreach { t =>
      val got = encodeOne(t, merges)
      val want = t.split(" ", -1).toSeq.map(w => refEncode(w, merges))
      assert(got == want, s"diverged on: ${t.take(60)}…")
    }
  }

  test("round trip: concatenated subwords rebuild each word exactly") {
    val merges = Bpe.trainMerges(Tables.documents(spark, sfDir), col("text"), 10)
    val bad = Tables.documents(spark, sfDir)
      .select(col("text"),
        array_join(transform(graft.functions.bpe_subwords(col("text"), merges),
          w => concat_ws("", w)), " ").as("rebuilt"))
      .filter(col("text") =!= col("rebuilt")).count()
    assert(bad == 0, s"$bad documents failed the round trip")
  }

  test("sampled training is deterministic and stays close to full-corpus merges") {
    val d = Tables.documents(spark, sfDir)
    val s1 = Bpe.trainMergesSampled(d, col("doc_id"), col("text"),
      numMerges = 10, sampleCount = 200)
    val s2 = Bpe.trainMergesSampled(d.repartition(5), col("doc_id"), col("text"),
      numMerges = 10, sampleCount = 200)
    assert(s1 == s2, "sampled training depends on partitioning")
    // merge ranks stabilize on a fraction of the data: the sampled
    // vocabulary shares most of the full-corpus merge SET
    val full = Bpe.trainMerges(d, col("text"), 10).toSet
    assert(s1.toSet.intersect(full).size >= 7,
      s"sampled merges diverged too far: ${s1.toSet -- full}")
  }

  test("training is deterministic, partition-invariant, and compresses the corpus") {
    val d = Tables.documents(spark, sfDir)
    val m1 = Bpe.trainMerges(d, col("text"), 15)
    val m2 = Bpe.trainMerges(d.repartition(7), col("text"), 15)
    assert(m1 == m2, "training depends on partitioning")
    assert(m1.size == 15)
    val before = Bpe.tokenStats(d, col("doc_id"), col("text"), Nil)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    val after = Bpe.tokenStats(d, col("doc_id"), col("text"), m1)
      .agg(sum("n_bpe_tokens")).as[Long].head()
    assert(after < before,
      s"15 merges did not compress: $before -> $after")
  }
}
