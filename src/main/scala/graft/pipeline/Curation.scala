package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sampling.Sampling

/** The end-to-end corpus-curation pipeline — the flagship composition of the
  * training-data operators: exact dedup → integer quality gates → stratified
  * mixing sample, in one declarative plan. A user pointing this at a raw
  * crawl gets back the training mix; every stage is the library operator it
  * is built from, so each stage's scale shape is the one already audited.
  *
  * 100 TB shape, stage by stage:
  *   1. exact dedup: one partial-agg shuffle on the 128-bit content hash to
  *      pick each group's keeper (min id), then a join of the corpus against
  *      the keeper set on (hash, id) — both sides hash-partitioned by the
  *      join key, no text moves (the hash stands in for it).
  *   2. quality gates: row-local integer metrics (token counts, distinct
  *      ratio via cross-multiplication) — no shuffle, pushdown-friendly.
  *   3. mixing sample: row-local hash threshold per stratum — no shuffle.
  * Net: the whole pipeline costs ONE repartition-sized shuffle over hashes
  * plus a co-partitioned join; text is only read, never shuffled.
  */
object Curation {

  /** Curate `df`: drop exact duplicates (keep the min-id copy), keep docs
    * with `minTokens <= n_tokens <= maxTokens` and at least
    * `minDistinctPct`% distinct tokens, then sample per-stratum at
    * `ratesPerMille` (by each row's own id hash; `defaultPerMille`
    * elsewhere). Output: one row per kept doc with its integer quality
    * metrics and sample bucket.
    */
  def curate(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      strataCol: Column,
      minTokens: Int,
      maxTokens: Int,
      minDistinctPct: Int,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    val base = df.select(
      idCol.as("doc_id"), strataCol.as("stratum"),
      md5(textCol).as("content_hash"),
      TextFunctions.token_count(textCol).as("n_tokens"),
      size(array_distinct(TextFunctions.tokens(textCol))).as("n_distinct_tokens"))
    val keepers = base
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    val deduped = base.join(keepers, Seq("content_hash", "doc_id"))
    val gated = deduped
      .filter(col("n_tokens").between(minTokens, maxTokens))
      // distinct-ratio gate in integer cross-multiplication (no float drift)
      .filter(col("n_distinct_tokens") * 100 >= col("n_tokens") * minDistinctPct)
    Sampling.stratifiedByHash(
        gated, col("doc_id"), col("stratum"), ratesPerMille, defaultPerMille)
      .select(col("doc_id"), col("stratum"), col("n_tokens"),
        col("n_distinct_tokens"), col("sample_bucket"))
  }

  /** Filter-attrition funnel: for each stratum, how many documents survive
    * each quality rule CUMULATIVELY — the report a pipeline operator reads
    * before committing to a filter chain (which rule is doing the cutting,
    * and on which language/source). Rules, applied in order:
    *   1. token count in `[minTokens, maxTokens]`;
    *   2. distinct-token ratio ≥ `minDistinctPct`% (cross-multiplied);
    *   3. mean word length in `[minMeanWordLen, maxMeanWordLen]` — computed
    *      as total non-space chars vs token count, cross-multiplied, so the
    *      whole funnel stays in integers and the oracle hash-matches.
    * Every metric is row-local array/length arithmetic; the funnel itself is
    * ONE map-side-combinable aggregation to strata cardinality (~10–100
    * rows). The corpus is scanned once and never shuffled.
    */
  def filterFunnel(
      df: DataFrame,
      textCol: Column,
      strataCol: Column,
      minTokens: Int,
      maxTokens: Int,
      minDistinctPct: Int,
      minMeanWordLen: Int,
      maxMeanWordLen: Int): DataFrame = {
    val n = TextFunctions.token_count(textCol).cast("long")
    val nd = size(array_distinct(TextFunctions.tokens(textCol))).cast("long")
    // total word chars = doc length minus the n-1 separating spaces
    val chars = length(textCol).cast("long") - (n - 1)
    val r1 = n.between(minTokens, maxTokens)
    val r2 = nd * 100 >= n * minDistinctPct
    val r3 = chars >= n * minMeanWordLen && chars <= n * maxMeanWordLen
    val one = (c: Column) => when(c, 1L).otherwise(0L)
    df.groupBy(strataCol.as("stratum"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(one(r1)).as("pass_len"),
        sum(one(r1 && r2)).as("pass_len_distinct"),
        sum(one(r1 && r2 && r3)).as("survivors"))
  }
}
