package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.sampling.Sampling

/** Unit oracles for the round-4 pipeline additions: duplicated-span stats
  * (exact-substring dedup signal), hash-stratified sampling, top-terms, and
  * token-window chunking. The sf0.01 DuckDB oracle checks the same operators
  * end-to-end; these tests pin the hand-computable semantics.
  */
class SamplingAndSpansSpec extends SparkTestBase {
  import spark.implicits._

  // --- duplicatedSpanStats -------------------------------------------------

  test("duplicatedSpanStats counts positions whose n-gram occurs in another doc") {
    // doc 1 and doc 2 share the exact 5-token run "a b c d e"; doc 3 is unique.
    val docs = Seq(
      (1L, "a b c d e x y"),      // 3 windows; window 0 ("a b c d e") duplicated
      (2L, "q a b c d e"),        // 2 windows; window 1 duplicated
      (3L, "p q r s t u v")       // 3 windows; none duplicated
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, col("doc_id"), col("text"), n = 5)
      .orderBy("doc_id").collect()
    assert(out.toSeq === Seq(Row(1L, 3L, 1L), Row(2L, 2L, 1L), Row(3L, 3L, 0L)))
  }

  test("duplicatedSpanStats: repeats inside ONE doc are not duplicated spans") {
    // the window repeats within the doc but exists nowhere else → df == 1
    val docs = Seq((1L, "a b a b a b a b a b")).toDF("doc_id", "text")
    val Array(r) = Dedup.duplicatedSpanStats(docs, col("doc_id"), col("text"), n = 5).collect()
    assert(r.getLong(1) === 6L && r.getLong(2) === 0L)
  }

  test("duplicatedSpanStats: short docs yield exactly one clamped window") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanStats(docs, col("doc_id"), col("text"), n = 5)
      .orderBy("doc_id").collect()
    // both docs have the single window "a b", shared → duplicated
    assert(out.toSeq === Seq(Row(1L, 1L, 1L), Row(2L, 1L, 1L)))
  }

  // --- stratifiedByHash ----------------------------------------------------

  private val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
  private val rates = Map("en" -> 900, "zh" -> 600, "de" -> 400, "es" -> 250)

  test("stratifiedByHash applies each stratum's rate and the default") {
    val out = Sampling.stratifiedByHash(
      corpus, col("doc_id"), col("lang"), rates, defaultPerMille = 100)
    val bad = out.filter(col("sample_bucket") >=
      coalesce(element_at(
        map(rates.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("lang")), lit(100)))
    assert(bad.count() === 0L)
    // every stratum present in the corpus survives at these rates
    assert(out.select("lang").distinct().count() ===
      corpus.select("lang").distinct().count())
  }

  test("stratifiedByHash is deterministic and nested across rates") {
    val a = Sampling.stratifiedByHash(corpus, col("doc_id"), col("lang"),
      Map.empty, defaultPerMille = 700).select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedByHash(corpus, col("doc_id"), col("lang"),
      Map.empty, defaultPerMille = 700).select("doc_id").as[Long].collect().toSet
    val smaller = Sampling.stratifiedByHash(corpus, col("doc_id"), col("lang"),
      Map.empty, defaultPerMille = 400).select("doc_id").as[Long].collect().toSet
    assert(a === b)                       // reproducible
    assert(smaller.subsetOf(a))           // rate-400 ⊂ rate-700
    val n = corpus.count()
    // 700‰ of a 100-doc corpus: loose binomial bounds, deterministic hash
    assert(smaller.size < a.size && a.size > n * 5 / 10 && a.size < n * 9 / 10)
  }

  test("temperatureMix rebalances toward n^alpha shares and nests within strata") {
    val docs = Tables.documents(spark, sfDir)
    val census = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = census.values.sum / 3
    val prop = Sampling.temperatureMixByHash(docs, col("doc_id"), col("lang"), "prop", budget)
    val sqrtM = Sampling.temperatureMixByHash(docs, col("doc_id"), col("lang"), "sqrt", budget)
    val equal = Sampling.temperatureMixByHash(docs, col("doc_id"), col("lang"), "equal", budget)
    def shares(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy(col("lang")).agg(count(lit(1)).as("k"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (big, small) = {
      val s = census.toSeq.sortBy(-_._2); (s.head._1, s.last._1)
    }
    // only meaningful when the corpus is actually imbalanced
    assert(census(big) > 2 * census(small), s"fixture not imbalanced: $census")
    def ratio(m: Map[String, Long]): Double =
      m.getOrElse(big, 0L).toDouble / math.max(1L, m.getOrElse(small, 0L))
    // α=1 keeps natural imbalance; α=0.5 compresses it; α=0 flattens hardest
    assert(ratio(shares(prop)) > ratio(shares(sqrtM)),
      s"sqrt must compress the ${ratio(shares(prop))} vs ${ratio(shares(sqrtM))}")
    assert(ratio(shares(sqrtM)) >= ratio(shares(equal)),
      "equal shares must be at least as flat as sqrt")
    // per-stratum rates derived by integer math: every kept row passes its
    // own published rate, and the sample nests within each stratum across
    // budgets (same hash threshold discipline as stratifiedByHash)
    import spark.implicits._
    val smallSet = Sampling.temperatureMixByHash(docs, col("doc_id"), col("lang"), "sqrt", budget / 2)
      .select("doc_id").as[Long].collect().toSet
    val bigSet = sqrtM.select("doc_id").as[Long].collect().toSet
    assert(smallSet.subsetOf(bigSet), "half-budget sample must nest in the full one")
    assert(sqrtM.filter(col("sample_bucket") >= col("rate_pm")).isEmpty)
  }

  // --- topTerms ------------------------------------------------------------

  test("budgetMixByHash rejects a budget*weight outside the exact-floor range") {
    val d = Seq((1L, "en")).toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.budgetMixByHash(d, col("doc_id"), col("lang"),
        Map("en" -> 1000), budget = (1L << 53))
    }
    assert(e.getMessage.contains("2^53"), e.getMessage)
    // in-range budgets still work
    assert(Sampling.budgetMixByHash(d, col("doc_id"), col("lang"),
      Map("en" -> 1000), budget = 100L).count() >= 0)
  }

  test("packed_id packs in-bound keys and raises on out-of-bound ones") {
    val ok = Seq((5L, 7L)).toDF("hi", "lo").repartition(1)
      .select(graft.functions.packed_id(col("hi"), col("lo"), 1048576L).as("p"))
      .as[Long].head()
    assert(ok == 5L * 1048576L + 7L)
    // lo at the pack bound would collide with (hi+1, 0) — must fail loudly
    val e = intercept[Exception] {
      Seq((5L, 1048576L)).toDF("hi", "lo").repartition(1)
        .select(graft.functions.packed_id(col("hi"), col("lo"), 1048576L))
        .collect()
    }
    assert(e.getMessage.contains("packed_id") ||
      Option(e.getCause).exists(_.getMessage.contains("packed_id")), s"unexpected: $e")
  }

  test("topTerms ranks by tf desc, then rarer-corpus-term (df asc), then token") {
    val docs = Seq(
      (1L, "x x x common common rare"),
      (2L, "common common y y z")
    ).toDF("doc_id", "text")
    val out = TextFunctions.topTerms(docs, col("doc_id"), col("text"), k = 2)
      .orderBy("doc_id", "rank").collect()
    assert(out.toSeq === Seq(
      Row(1L, 1, "x", 3L, 1L),        // tf 3, df 1
      Row(1L, 2, "common", 2L, 2L),   // tf 2, df 2
      Row(2L, 1, "y", 2L, 1L),        // tf 2 ties common — df asc: y (df 1) first
      Row(2L, 2, "common", 2L, 2L)))
  }

  test("topTerms df-ascending tiebreak puts the rarer term first") {
    val docs = Seq((1L, "shared unique"), (2L, "shared")).toDF("doc_id", "text")
    val out = TextFunctions.topTerms(docs, col("doc_id"), col("text"), k = 2)
      .filter(col("doc_id") === 1L).orderBy("rank").collect()
    // tf 1 each; unique has df 1 < shared df 2 → unique ranks first
    assert(out.toSeq === Seq(Row(1L, 1, "unique", 1L, 1L), Row(1L, 2, "shared", 1L, 2L)))
  }

  // --- curation pipeline ---------------------------------------------------

  test("curate drops exact dupes (min-id keeper), gates quality, then samples") {
    val long = (1 to 40).map(i => s"w${i % 20}").mkString(" ")   // 40 toks, 20 distinct
    val docs = Seq(
      (10L, long, "en"),              // keeper (min id of the dup pair)
      (20L, long, "en"),              // exact duplicate → dropped
      (30L, "a b c", "en"),           // 3 tokens < minTokens → dropped
      (40L, (1 to 40).map(_ => "x").mkString(" "), "en"), // 1/40 distinct → dropped
      (50L, (1 to 35).map(i => s"u$i").mkString(" "), "en") // 35 toks, all distinct → kept
    ).toDF("doc_id", "text", "lang")
    val out = graft.pipeline.Curation.curate(
      docs, col("doc_id"), col("text"), col("lang"),
      minTokens = 30, maxTokens = 80, minDistinctPct = 40,
      Map("en" -> 1000), defaultPerMille = 0)   // rate 1000 ⇒ sampling keeps all
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L, 50L))
    val r10 = out.head
    assert(r10.getInt(2) === 40 && r10.getInt(3) === 20) // n_tokens, n_distinct
  }

  // --- chunkByTokens -------------------------------------------------------

  test("chunkByTokens windows with overlap and a short trailing chunk") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, text)).toDF("doc_id", "text")
    val out = TextFunctions.chunkByTokens(docs, col("doc_id"), col("text"),
      chunkSize = 4, overlap = 1).orderBy("chunk_idx").collect()
    assert(out.toSeq === Seq(
      Row(7L, 0, "t1 t2 t3 t4", 4),
      Row(7L, 1, "t4 t5 t6 t7", 4),   // starts at stride 3: overlaps t4
      Row(7L, 2, "t7 t8 t9 t10", 4),
      Row(7L, 3, "t10", 1)))          // trailing remainder
  }

  test("chunkByTokens: doc shorter than one chunk is a single chunk") {
    val docs = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
    val out = TextFunctions.chunkByTokens(docs, col("doc_id"), col("text"),
      chunkSize = 64, overlap = 16).orderBy("doc_id").collect()
    // split("", " ") == Array("") — the empty doc is one empty-token chunk
    assert(out.toSeq === Seq(Row(1L, 0, "a b", 2), Row(2L, 0, "", 1)))
  }

  test("label-balanced replication lands every class within half its size of the target") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .filter(col("label") >= 5 || col("vec_id") % 7 === 0)
    val out = graft.sampling.Sampling.balanceByReplication(e, col("vec_id"), col("label"))
    val orig = e.groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    val target = orig.values.max
    val balanced = out.groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    assert(balanced.keySet == orig.keySet)
    balanced.foreach { case (l, n) =>
      assert(math.abs(n - target) <= (orig(l) + 1) / 2,
        s"label $l: balanced to $n, target $target, tolerance ${orig(l) / 2}")
    }
    // the majority class is untouched; a minority class actually replicated
    assert(balanced(orig.maxBy(_._2)._1) == target)
    val minority = orig.minBy(_._2)._1
    assert(balanced(minority) >= 4 * orig(minority),
      s"minority label $minority should replicate hard: ${orig(minority)} -> ${balanced(minority)}")
    // per (id) the copy indexes are exactly 1..k — usable as a replication key
    val badRuns = out.groupBy(col("id"), col("n_copies"))
      .agg(count(lit(1)).as("c"), min(col("copy")).as("lo"), max(col("copy")).as("hi"))
      .filter(col("c") =!= col("n_copies") || col("lo") =!= 1 || col("hi") =!= col("n_copies"))
      .count()
    assert(badRuns == 0, "copy indexes must be a complete 1..k run per row")
  }

  test("target mixing hits shares, saturates small strata, nests, zeroes unknown strata") {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    def mix(budget: Long) = graft.sampling.Sampling.mixToTarget(
      d, col("doc_id"), col("lang"),
      Map("en" -> 500, "de" -> 250, "zh" -> 150, "es" -> 100), budget)
    val out = mix(200L)
    val byLang = out.groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    val census = d.groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    // per-stratum counts near ⌊budget·share/1000⌋ (hash-rate noise band),
    // capped at the stratum's population
    Map("en" -> 100L, "de" -> 50L, "zh" -> 30L, "es" -> 20L).foreach { case (l, t) =>
      val target = math.min(t, census.getOrElse(l, 0L))
      val got = byLang.getOrElse(l, 0L)
      assert(math.abs(got - target) <= math.max(6L, target / 3),
        s"$l: got $got, target $target")
    }
    // strata not in the share map contribute nothing
    assert(out.filter(!col("lang").isin("en", "de", "zh", "es")).count() == 0)
    // saturation: a budget far above the corpus keeps whole strata, never more
    val big = mix(1000000L).groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    Seq("en", "de", "zh", "es").foreach { l =>
      assert(big.getOrElse(l, 0L) == census.getOrElse(l, 0L),
        s"$l must saturate at its population")
    }
    // nesting: the smaller budget's sample is a subset of the larger's
    assert(mix(100L).select("doc_id").exceptAll(out.select("doc_id")).isEmpty,
      "budget-100 sample must nest inside budget-200")
  }

  test("leakage-safe split never separates duplicates, covers all docs, near-matches weights") {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    // plant canonical duplicates: exact copies AND punctuation-variant copies
    val copies = d.limit(40).select((col("doc_id") + 700000L).as("doc_id"),
      when(col("doc_id") % 2 === 0, concat(col("text"), lit("!!")))
        .otherwise(col("text")).as("text"))
    val corpus = d.unionByName(copies)
    val out = graft.sampling.Sampling.leakageSafeSplit(
      corpus, col("doc_id"), col("text"),
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    // total coverage, one row per doc
    assert(out.count() == corpus.count())
    // no group straddles a split boundary — THE leakage property
    val straddling = out.groupBy(col("group_key"))
      .agg(countDistinct(col("split")).as("k")).filter(col("k") > 1).count()
    assert(straddling == 0, "a duplicate group straddles the split boundary")
    // every planted copy sits in the same split as its original
    val planted = out.filter(col("doc_id") >= 700000L)
      .select((col("doc_id") - 700000L).as("doc_id"), col("split").as("copy_split"))
    val mismatched = planted.join(out, "doc_id")
      .filter(col("split") =!= col("copy_split")).count()
    assert(mismatched == 0, "a planted duplicate landed in a different split")
    // shares near the weights (hash noise band)
    val shares = out.groupBy(col("split")).count().as[(String, Long)].collect().toMap
    val n = out.count().toDouble
    assert(math.abs(shares("train") / n - 0.8) < 0.08, s"train share ${shares("train") / n}")
    assert(shares.keySet == Set("train", "val", "test"))
    // splitByGroup accepts any precomputed label (near-dup clusters etc.)
    val viaGroups = graft.sampling.Sampling.splitByGroup(
      out.select(col("doc_id"), col("group_key")),
      col("doc_id"), col("group_key"),
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    assert(viaGroups.exceptAll(out).isEmpty, "splitByGroup diverged from the composed form")
  }

  test("leakageSafeSplit assigns null-text and empty-text docs to exactly one split") {
    val docs = Seq((1L, "real content here"), (2L, null: String), (3L, ""),
      (4L, "real content here")).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, col("doc_id"), col("text"),
      Seq("train" -> 800, "val" -> 200))
    assert(out.count() == 4, "every input doc must land in a split")
    // null and empty text share a canonical group -> same split, same group
    val m = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(m(2L) == m(3L))
    assert(m(1L) == m(4L), "exact duplicates must never straddle the boundary")
  }

  test("census mixers keep null-stratum rows instead of silently dropping them") {
    val df = ((0 until 400).map(i => (i.toLong, "a")) ++
      (400 until 800).map(i => (i.toLong, null: String))).toDF("id", "lang")
    val tm = Sampling.temperatureMixByHash(df, col("id"), col("lang"), "equal", 400L)
    val nullKept = tm.filter(col("lang").isNull).count()
    assert(nullKept > 100 && nullKept < 300,
      s"null stratum should sample at ~its equal-share rate, kept $nullKept")
    val bm = Sampling.budgetMixByHash(df, col("id"), col("lang"),
      Map("a" -> 500), budget = 400L, defaultWeightPerMille = 500)
    assert(bm.filter(col("lang").isNull).count() > 0)
    val br = Sampling.balanceByReplication(
      df.filter(col("id") < 410), col("id"), col("lang"))
    assert(br.filter(col("label").isNull).count() > 0,
      "null-label rows must replicate toward the majority class")
  }

  test("temperatureMixByHash refuses a budget whose rate arithmetic would wrap") {
    val df = Seq((1L, "a")).toDF("id", "lang")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixByHash(df, col("id"), col("lang"), "equal", Long.MaxValue)
    }
  }

  test("perSourceCap and the mix stages refuse non-integral doc ids loudly") {
    val d = Seq(("u-1", "s", 0.5)).toDF("doc_id", "source", "score")
    intercept[IllegalArgumentException] {
      graft.pipeline.Curation.perSourceCap(d, col("doc_id"), col("source"), col("score"), 3)
    }
    intercept[IllegalArgumentException] {
      graft.pipeline.Curation.curateTrainingMix(
        Seq(("u-1", "t", "s", "l")).toDF("doc_id", "text", "source", "lang"),
        col("doc_id"), col("text"), col("source"), col("lang"),
        keepFrac = 0.5, cap = 10, alpha = "equal", budget = 100L)
    }
  }

  test("NaN scores neither crash the cap nor bypass it") {
    // an all-NaN source used to leave an empty kept array (element_at crash);
    // a mixed source used to admit NaN rows past the broadcast cut
    val scored = Seq(
      (1L, "s1", "en", "h1", 0.9), (2L, "s1", "en", "h2", Double.NaN),
      (3L, "s1", "en", "h3", 0.8), (4L, "s2", "en", "h4", Double.NaN)
    ).toDF("doc_id", "source", "stratum", "ch", "score")
    val out = graft.pipeline.Curation.mixFromScored(
      scored, keepFrac = 1.0, cap = 10, alpha = "equal", budget = 1000L)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(2L) && !ids.contains(4L),
      s"NaN-scored rows must not reach the mix: $ids")
    assert(ids.contains(1L) && ids.contains(3L))
  }
}
