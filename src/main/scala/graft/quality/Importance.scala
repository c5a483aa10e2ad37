package graft.quality

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level quality/selection scores that need a trained side table: a
  * hashed-feature importance weight (DSIR) and a unigram-LM likelihood
  * (CCNet-style perplexity filtering). Both follow the k-means residency
  * pattern ([[graft.similarity.Knn.kmeansAssignByCosine]]): the tiny model —
  * a B-bucket histogram or two scalar totals — lives on the driver between
  * the train and score passes, so scoring is a row-local lookup join and the
  * corpus text never shuffles.
  *
  * Engine-portable determinism (the pq26/pq39 fixed-point contract): every
  * per-feature log term is frozen to `floor(1e6·ln(...))` as an INTEGER once
  * — per-doc scores are integer sums, so partition order cannot change a
  * result — and doubles are only recovered at the end by IEEE divisions in a
  * fixed order.
  *
  * Null-text contract: the corpus scorers here ([[dsirWeights]],
  * [[linearQualityScore]], [[unigramNll]]) OMIT null-text documents from
  * their output — a null text explodes to zero feature rows, so there is
  * nothing to score; callers gating by join must left-join and decide the
  * null policy themselves. The row-local twin
  * [[linearQualityScoreRowLocal]] necessarily differs on exactly this edge:
  * it keeps the row and emits null score columns (a projection cannot drop
  * rows); its row-for-row equality with the join form holds for every
  * non-null text.
  */
object Importance {

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): represent each document as
    * a bag of hashed word uni+bigrams in `buckets` buckets, fit two bucket
    * distributions — `isTarget` rows (the clean/target corpus) vs the rest
    * (the raw pool) — and score every document by its summed per-feature
    * log-likelihood ratio `Σ ln(p_target(b)/p_raw(b))` (add-one smoothed).
    * High weight = looks like the target distribution; the caller samples
    * `∝ exp(weight)` or thresholds.
    *
    * 100 TB shape: pass 1 is one partial-agged shuffle to `buckets` rows
    * (the 2·B-long histogram is the driver residency); pass 2 re-scans,
    * joins the B-row ratio table as a broadcast local relation, and
    * partial-aggs to one row per doc — text never moves, shuffled bytes are
    * two fixed-width columns per doc.
    */
  def dsirWeights(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      isTarget: Column,
      buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val feats = df
      .select(
        idCol.as("doc_id"), isTarget.as("is_t"),
        concat(
          graft.functions.word_ngram_hashes(textCol, 1),
          graft.functions.word_ngram_hashes(textCol, 2)).as("hs"))
      .select(col("doc_id"), col("is_t"), explode(col("hs")).as("h"))
      .withColumn("b", pmod(col("h"), lit(buckets.toLong)).cast("int"))

    val hist = feats.groupBy(col("b")).agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(col("is_t"), 0L).otherwise(1L)).as("cr"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nT = hist.map(_._2).sum.toDouble + buckets
    val nR = hist.map(_._3).sum.toDouble + buckets
    // one frozen integer per OBSERVED bucket (unobserved buckets cannot be
    // joined against); ~2B log evaluations total, not one per feature
    val ratios = hist.toSeq.map { case (b, ct, cr) =>
      (b, math.floor(1e6 *
        (math.log((ct + 1).toDouble / nT) - math.log((cr + 1).toDouble / nR))).toLong)
    }
    val spark = df.sparkSession
    import spark.implicits._
    val lTable = ratios.toDF("b", "lfp")
    feats.join(broadcast(lTable), "b")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lfp")).as("w_fp"))
      .withColumn("weight", col("w_fp").cast("double") / lit(1e6))
  }

  /** Linear quality classifier SCORER — the fastText-style quality-filter
    * step (a trained linear model over hashed bag-of-ngram features, the
    * GPT-3/CCNet-lineage "quality classifier" applied at corpus scale). The
    * model arrives as data: a `(b, w_fp)` weight table in the same hashed
    * uni+bigram bucket space as [[dsirWeights]] (train anywhere — including
    * with `dsirWeights` itself, whose ratio table IS a naive-Bayes linear
    * model), fixed-point integers under the pq26/pq39 determinism contract.
    *
    * Per doc: `logit_fp = Σ w_fp[bucket(feature)] + bias_fp · n_feats`, so
    * `logit_fp / n_feats` is the mean per-feature logit (length-invariant);
    * `keep` gates on that mean vs `threshold_fp` by integer
    * cross-multiplication — no float ever decides a row.
    *
    * 100 TB shape: the weight table broadcasts (B rows), features are
    * row-local hashes, and the only shuffle is the per-doc partial agg of
    * two fixed-width integers — text never moves.
    */
  def linearQualityScore(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      weights: DataFrame, // (b: Int, w_fp: Long) fixed-point 1e-6 weights
      buckets: Int,
      biasFp: Long = 0L,
      thresholdFp: Long = 0L): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val feats = df
      .select(idCol.as("doc_id"),
        concat(
          graft.functions.word_ngram_hashes(textCol, 1),
          graft.functions.word_ngram_hashes(textCol, 2)).as("hs"))
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .withColumn("b", pmod(col("h"), lit(buckets.toLong)).cast("int"))
    // Dedup the weight table: duplicate (b, w_fp) rows in a caller-built
    // table (e.g. a union of training runs) would multiply every matching
    // feature row, inflating n_feats and sum_fp together — silently wrong
    // scores. Deduped ON THE DRIVER (this file's tiny-model residency
    // pattern; the table is classifier-sized and broadcast anyway) so the
    // scoring plan gains no Exchange — PlanAuditSpec pins pq51's budget.
    // Two rows with the SAME bucket but DIFFERENT weights remain the
    // caller's contract violation (bucket is a primary key).
    val wDedup = weights.select(col("b"), col("w_fp")).distinct()
    val wLocal = weights.sparkSession.createDataFrame(
      java.util.Arrays.asList(wDedup.collect(): _*), wDedup.schema)
    feats
      .join(broadcast(wLocal), Seq("b"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("w_fp"), lit(0L))).as("sum_fp"))
      .withColumn("logit_fp", col("sum_fp") + lit(biasFp) * col("n_feats"))
      .withColumn("score",
        col("logit_fp").cast("double") / col("n_feats") / lit(1e6))
      .withColumn("keep", col("logit_fp") >= lit(thresholdFp) * col("n_feats"))
  }

  /** [[linearQualityScore]] in ROW-LOCAL form: the weight table rides as one
    * map literal (fine for the classifier-sized B of real quality models;
    * use the broadcast-join form when B outgrows a literal), so scoring is a
    * single stateless projection — zero shuffle, zero state. That makes it
    * directly usable inside an append-mode STREAMING pipeline as a gate
    * stage (the groupBy form would demand a stateful aggregation there);
    * StreamingPipelineSpec runs it online, CurationOpsSpec asserts it equals
    * the broadcast-join form row for row.
    */
  def linearQualityScoreRowLocal(
      df: DataFrame,
      textCol: Column,
      weights: Map[Int, Long],
      buckets: Int,
      biasFp: Long = 0L,
      thresholdFp: Long = 0L): DataFrame = {
    require(buckets > 0, s"buckets=$buckets must be positive")
    val wMap = typedLit(weights)
    val hs = concat(
      graft.functions.word_ngram_hashes(textCol, 1),
      graft.functions.word_ngram_hashes(textCol, 2))
    df.withColumn("__hs", hs)
      .withColumn("n_feats", size(col("__hs")).cast("long"))
      .withColumn("sum_fp", aggregate(col("__hs"), lit(0L), (acc, h) =>
        acc + coalesce(
          element_at(wMap, pmod(h, lit(buckets.toLong)).cast("int")), lit(0L))))
      .withColumn("logit_fp", col("sum_fp") + lit(biasFp) * col("n_feats"))
      .withColumn("score",
        col("logit_fp").cast("double") / col("n_feats") / lit(1e6))
      .withColumn("keep", col("logit_fp") >= lit(thresholdFp) * col("n_feats"))
      .drop("__hs")
  }

  /** Unigram-LM negative log-likelihood per token — the CCNet/Gopher-family
    * "perplexity filter" reduced to its engine-shaped core: fit add-one
    * smoothed unigram probabilities on the `lmSubset` rows (vocabulary
    * df-pruned at `minCount` — the same cutoff that keeps a real pipeline's
    * vocab bounded; everything rarer scores as one OOV event), then score
    * EVERY document by its mean `-ln p(token)`. Low = fluent under the LM
    * corpus, high = junk/foreign — callers threshold on `avg_nll`.
    *
    * 100 TB shape: the vocab is one token-keyed partial agg (bounded by the
    * cutoff and Zipf, so it broadcasts); scoring is explode → broadcast
    * lookup → per-doc partial agg. If a vocab ever outgrew the broadcast the
    * same plan holds with a token-hash shuffle join — no operator changes.
    */
  def unigramNll(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      lmSubset: Column,
      minCount: Int): DataFrame = {
    val toks = df.select(
      idCol.as("doc_id"), lmSubset.as("is_lm"),
      explode(TextFunctions.tokens(textCol)).as("tok"))
    val vocab = toks.filter(col("is_lm"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    // scalar residency: N tokens + V types under the cutoff
    val Row(nTok: Long, vSize: Long) =
      vocab.agg(coalesce(sum(col("c")), lit(0L)), count(lit(1))).head()
    val denom = (nTok + vSize + 1).toDouble
    val lv = vocab.select(
      col("tok"),
      floor(-log((col("c") + 1).cast("double") / lit(denom)) * lit(1e6))
        .cast("long").as("lfp"))
    val oovL = math.floor(-math.log(1.0 / denom) * 1e6).toLong
    toks.join(broadcast(lv), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lfp"), lit(oovL))).as("nll_fp"))
      .withColumn("avg_nll",
        col("nll_fp").cast("double") / col("n_tokens") / lit(1e6))
  }
}
