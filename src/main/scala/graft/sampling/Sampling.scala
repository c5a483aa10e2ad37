package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.portable_hash

/** Deterministic sampling operators for dataset mixing — the step that turns
  * a deduped/filtered corpus into a training mix with per-stratum weights
  * (e.g. upsample books, downsample crawl).
  *
  * Selection is by hash threshold, not `rand()`: a row is kept iff
  * `portable_hash(id) mod 1000 < rate_per_mille(stratum)`. That makes the
  * sample reproducible across runs, independent of partitioning and row
  * order, stable under incremental arrivals (a re-run over a grown corpus
  * keeps every previously-selected row), and cheap — the whole operator is
  * one row-local projection + filter, zero shuffles at any scale. Rates are
  * per-mille integers so the oracle compares integers, never floats.
  */
object Sampling {

  /** Keep each row with probability `ratesPerMille(stratum)/1000`
    * (`defaultPerMille` for strata not in the map), decided by the row's own
    * id hash. The `sample_bucket` column (0-999) is kept in the output so
    * downstream stages can sub-sample consistently (a rate-400 sample is a
    * strict subset of a rate-700 one).
    */
  def stratifiedByHash(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int): DataFrame = {
    require(ratesPerMille.values.forall(r => r >= 0 && r <= 1000) &&
      defaultPerMille >= 0 && defaultPerMille <= 1000,
      "per-mille rates must be in [0, 1000]")
    // row-local map literal (sorted for a deterministic plan), no join
    val kvs = ratesPerMille.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val rate =
      if (kvs.isEmpty) lit(defaultPerMille)
      else coalesce(element_at(map(kvs: _*), strataCol), lit(defaultPerMille))
    df.withColumn("sample_bucket",
        pmod(portable_hash(idCol.cast("string")), lit(1000L)))
      .filter(col("sample_bucket") < rate)
  }

  /** EXACT per-stratum budgets: keep precisely `min(countPerStratum, |stratum|)`
    * rows per stratum — the fixed-token-budget form of dataset mixing, where
    * rate-based sampling can't hit a hard target. Selection order is the
    * row's own id hash (id as the unique tiebreak), so the sample is
    * reproducible, order-independent, and NESTED: a budget-100 sample is a
    * strict prefix of a budget-200 one.
    *
    * Scale shape (strata are languages/sources — cardinality ~10–100, so a
    * plain `Window.partitionBy(stratum)` would sort whole strata on single
    * reducers): the selection runs on a narrow `(id, stratum, hash)`
    * projection in two pruning levels. Level 1 ranks within
    * `(hash mod pruneBuckets, stratum)` — a well-distributed key — and keeps
    * each bucket's local top `countPerStratum`; any row in the global
    * per-stratum top-K is necessarily in its own bucket's top-K, so this
    * prunes without loss. Level 2 ranks the ≤ buckets×K survivors per
    * stratum — metadata-sized. The kept ids (≤ strata×K rows) broadcast back
    * onto the corpus as a semi join, so the full-width rows NEVER shuffle.
    * Requires unique, non-null ids (the operator's id contract).
    */
  def fixedCountByHash(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      countPerStratum: Int,
      pruneBuckets: Int = 0): DataFrame = {
    require(countPerStratum > 0, s"countPerStratum=$countPerStratum must be positive")
    import org.apache.spark.sql.expressions.Window
    val buckets =
      if (pruneBuckets > 0) pruneBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val narrow = df.select(
      idCol.as("__id"), strataCol.as("__stratum"),
      portable_hash(idCol.cast("string")).as("__h"))
    val wLocal = Window
      .partitionBy(pmod(col("__h"), lit(buckets.toLong)), col("__stratum"))
      .orderBy(col("__h").asc, col("__id").asc)
    val wGlobal = Window.partitionBy(col("__stratum"))
      .orderBy(col("__h").asc, col("__id").asc)
    val keep = narrow
      .withColumn("__lrk", row_number().over(wLocal))
      .filter(col("__lrk") <= countPerStratum)
      .withColumn("__rk", row_number().over(wGlobal))
      .filter(col("__rk") <= countPerStratum)
      .select(col("__id").as("__keep_id"))
    df.withColumn("stratum", strataCol)
      .join(broadcast(keep), idCol === col("__keep_id"), "left_semi")
  }
}
