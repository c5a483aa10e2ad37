package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Equivalence oracle for the native winnowing kernel: the monotonic-deque
  * [[graft.plans.SlidingMinDistinct]] must be bit-identical — values AND
  * order — to the declarative transform/slice/array_min + array_distinct
  * pipeline it replaced, across window regimes and the clamp edge cases
  * (doc shorter than n tokens, fewer hashes than w).
  */
class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("native winnow fingerprints are bit-identical to the declarative pipeline") {
    val d = Tables.documents(spark, sfDir)
    for ((n, w) <- Seq((4, 5), (3, 2), (2, 9), (1, 1))) {
      val both = d.select(
          TextFunctions.winnow_fingerprints(col("text"), n, w).as("nat"),
          TextFunctions.declarative_winnow_fingerprints(col("text"), n, w).as("dec"))
        .filter(not(col("nat") === col("dec")))
      assert(both.isEmpty, s"n=$n w=$w: native diverged from declarative")
    }
  }

  test("winnow kernel handles degenerate docs like the declarative clamp") {
    // shorter than n tokens (whole text = one window), exactly w hashes,
    // w+1 hashes (first real slide), heavy repetition (consecutive-dup
    // dropping must not lose a LATER re-occurrence separated by other
    // minima), empty text
    val docs = Seq(
      "a", "a b", "one two three", "a b c d e f g",
      "x x x x x x x x x x", "a b a b a b a b a b a b",
      "p q r s t u v w x y z p q r s t u v w x y z", "")
    val df = docs.toDF("text")
    for ((n, w) <- Seq((4, 5), (2, 3), (1, 2))) {
      val rows = df.select(
          TextFunctions.winnow_fingerprints(col("text"), n, w).as("nat"),
          TextFunctions.declarative_winnow_fingerprints(col("text"), n, w).as("dec"))
        .as[(Seq[Long], Seq[Long])].collect()
      rows.zip(docs).foreach { case ((nat, dec), doc) =>
        assert(nat == dec, s"n=$n w=$w doc='$doc': $nat != $dec")
      }
    }
  }

  test("winnowing guarantee: shared runs of >= w+n-1 tokens share a fingerprint") {
    val (n, w) = (4, 5)
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 = w+n-1 tokens
    val a = s"unique prefix tokens here $shared and some tail"
    val b = s"totally different head words $shared other ending material"
    val fps = Seq(a, b).toDF("text")
      .select(TextFunctions.winnow_fingerprints(col("text"), n, w).as("fp"))
      .as[Seq[Long]].collect()
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty,
      "documents sharing a w+n-1 token run must share a winnow fingerprint")
  }

  test("native repeated-segments dedup equals the declarative form, edges included") {
    import org.apache.spark.sql.functions.col
    // corpus rows + adversarial edges: null, empty, single token, trailing
    // space (split keeps the empty trailing token), multi-space runs,
    // repeats at segment boundaries, a doc shorter than one segment
    val edges = Seq(
      (100001L, null.asInstanceOf[String]),
      (100002L, ""),
      (100003L, "one"),
      (100004L, "a b c d a b c d a b c d"),
      (100005L, "x y "),
      (100006L, "p  q   r"),
      (100007L, "s t u")).toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .unionAll(edges)
    for (n <- Seq(1, 4, 7)) {
      val native = TextFunctions.dropRepeatedSegments(corpus, col("doc_id"), col("text"), n)
        .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
      val decl = TextFunctions.dropRepeatedSegmentsDeclarative(corpus, col("doc_id"), col("text"), n)
        .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
      assert(native.keySet == decl.keySet)
      native.keySet.foreach { id =>
        assert(native(id) == decl(id),
          s"segTokens=$n doc $id: native ${native(id)} vs declarative ${decl(id)}")
      }
    }
  }

  test("native token/stopword counts equal the declarative split+filter forms") {
    import org.apache.spark.sql.functions._
    val edges = Seq((900001L, null.asInstanceOf[String]), (900002L, ""),
      (900003L, "the"), (900004L, "the the  and "), (900005L, "a of to in is it that for and the"))
      .toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .unionAll(edges)
    val native = corpus.select(col("doc_id"),
        graft.functions.toColumn(graft.plans.TokenStopCountsExpr(
          graft.functions.toExpr(col("text")), graft.functions.Stopwords.en)).as("c"))
      .select(col("doc_id"),
        coalesce(col("c.n_tokens"), lit(-1)), coalesce(col("c.n_stop"), lit(-1)))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val decl = corpus.select(col("doc_id"),
        coalesce(size(split(col("text"), " ")), lit(-1)).as("n"),
        coalesce(size(filter(split(col("text"), " "),
          t => t.isin(graft.functions.Stopwords.en: _*))), lit(-1)).as("s"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    corpus.select("doc_id").as[Long].collect().foreach { id =>
      (native.get(id), decl.get(id)) match {
        case (Some(nv), Some(dv)) =>
          // null text: both sides propagate null (coalesced to -1 here) —
          // the score stays null for null docs, unchanged
          assert(nv == dv, s"doc $id: native $nv vs declarative $dv")
        case other => fail(s"doc $id missing: $other")
      }
    }
  }
}
