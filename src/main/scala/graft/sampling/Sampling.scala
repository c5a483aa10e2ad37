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
}
