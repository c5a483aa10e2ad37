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

  /** Budget-DRIVEN mixture sampling: the caller states the mix it wants —
    * a total row budget and per-stratum target weights (per-mille) — and the
    * operator derives each stratum's acceptance rate from its measured
    * population: `rate_pm = min(1000, budget * weight_pm / count(stratum))`
    * (integer floor). Selection is then the usual id-hash threshold, so the
    * sample stays reproducible and nested. This is the missing half of
    * [[stratifiedByHash]]: there the caller must already know the rates;
    * here an over-represented stratum is automatically downsampled toward
    * its target share and an under-represented one passes through whole
    * (rate capped at 1000 — hash sampling cannot upsample).
    *
    * Scale shape: the per-stratum census is one map-side-combinable shuffle
    * producing a strata-cardinality table (~10–100 rows); rates broadcast
    * back; the keep decision is row-local. The corpus never shuffles.
    */
  /** Join per-stratum rates back NULL-SAFELY: a null stratum is a real
    * census group (unlabeled rows) and owns a rates row — a plain
    * using-column equi-join would silently drop those rows from the mix,
    * inconsistently with [[stratifiedByHash]] (which rates null strata at
    * the default). Callers drop `__stratum` after their keep filter.
    */
  private def joinRates(df: DataFrame, strataCol: Column, rates: DataFrame): DataFrame =
    df.withColumn("__stratum", strataCol)
      .join(broadcast(rates.withColumnRenamed("__stratum", "__stratum_r")),
        col("__stratum") <=> col("__stratum_r"))
      .drop("__stratum_r")

  def budgetMixByHash(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      weightsPerMille: Map[String, Int],
      budget: Long,
      defaultWeightPerMille: Int = 0): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    require(weightsPerMille.values.forall(_ >= 0) && defaultWeightPerMille >= 0,
      "weights must be non-negative")
    // the rate below is floor(budget·w / n) in DOUBLE; enforcing
    // budget·maxW < 2^53 makes that floor exact (the numerator is an
    // exactly-representable integer and |a/b−k|≥1/b≫ulp at these widths) —
    // the same driver-side overflow posture as temperatureMixByHash
    val maxW = (weightsPerMille.values ++ Iterator(defaultWeightPerMille, 1)).max.toLong
    require(budget <= (1L << 53) / maxW,
      s"budget=$budget * max weight=$maxW must stay below 2^53 for exact rates")
    val kvs = weightsPerMille.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    val wpm =
      if (kvs.isEmpty) lit(defaultWeightPerMille)
      else coalesce(element_at(map(kvs: _*), col("__stratum")),
        lit(defaultWeightPerMille))
    // budget*weight_pm stays far below 2^53, so the floor is exact
    val rates = df.groupBy(strataCol.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
      .select(col("__stratum"),
        least(lit(1000L),
          floor(lit(budget) * wpm / col("__n")).cast("long")).as("rate_pm"))
    joinRates(df, strataCol, rates)
      .withColumn("sample_bucket",
        pmod(portable_hash(idCol.cast("string")), lit(1000L)))
      .filter(col("sample_bucket") < col("rate_pm"))
      .drop("__stratum")
  }

  /** Temperature (α) mixing — derive the mix FROM the corpus itself: the
    * resulting stratum share is ∝ n_s^α, the standard rebalancing rule for
    * multilingual/multi-domain pretraining (α=1 natural proportions, α≈0.5
    * the sqrt smoothing of the mBERT/XLM-R lineage, α=0 equal shares).
    * [[budgetMixByHash]] needs the caller to STATE weights; this computes
    * them: `w_s ∈ {n_s, ⌊√n_s⌋, 1}`, per-stratum kept-row targets
    * `k_s = (B·w_s) div Σw`, acceptance `rate_pm = min(1000, (1000·k_s)
    * div n_s)`, then the usual id-hash threshold.
    *
    * Engine-exactness: ⌊√n⌋ of an exact integer is floor of a correctly-
    * rounded IEEE sqrt — identical in any engine — and everything after it
    * is 64-bit integer arithmetic (the two-step floor is the DEFINED
    * semantics, replicated verbatim in the oracle), so rates compare as
    * integers, never floats. Overflow guard: B·w_s must fit a long.
    *
    * Scale shape: one census shuffle to strata cardinality, Σw a driver
    * scalar, rates broadcast back, keep decision row-local — the corpus
    * never shuffles.
    */
  def temperatureMixByHash(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      alpha: String,
      budget: Long): DataFrame = {
    require(Seq("equal", "sqrt", "prop").contains(alpha),
      s"alpha must be one of equal|sqrt|prop (α=0, 0.5, 1), got $alpha")
    // the rate expression multiplies the per-stratum target by 1000 —
    // without this bound (mixToTarget's guard) a huge "no cap" budget wraps
    // the rate negative and the mix silently returns EMPTY
    require(budget > 0 && budget <= Long.MaxValue / 1000L,
      s"budget=$budget out of range")
    val census = df.groupBy(strataCol.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val wCol = alpha match {
      case "equal" => lit(1L)
      case "sqrt"  => floor(sqrt(col("__n").cast("double"))).cast("long")
      case "prop"  => col("__n")
    }
    val weighted = census.withColumn("__w", wCol)
    // Σw and the overflow guard are driver-resident (strata ~10-100 rows)
    val rows = weighted.select(col("__stratum"), col("__n"), col("__w")).collect()
    val sumW = rows.map(_.getLong(2)).sum
    require(sumW > 0, "no stratum has positive weight")
    rows.foreach(r => require(r.getLong(2) == 0L || budget <= Long.MaxValue / r.getLong(2),
      s"budget * weight overflows for stratum ${r.get(0)}"))
    // rates are rebuilt from the rows ALREADY collected for the guard —
    // re-selecting from `weighted` would execute the census subtree (and
    // everything upstream of df, e.g. mixStages' gate + cap chain) a second
    // full time at join, and a nondeterministic input could even make the
    // recomputed weights inconsistent with the driver-computed sumW. Same
    // 64-bit integer two-step floor, evaluated on the driver's copy.
    val stratumField = weighted.schema(weighted.schema.fieldIndex("__stratum"))
    val rateRows = rows.map { r =>
      val n = r.getLong(1)
      val kS = (budget * r.getLong(2)) / sumW
      org.apache.spark.sql.Row(r.get(0), math.min(1000L, (1000L * kS) / n))
    }
    val rates = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rateRows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        stratumField,
        org.apache.spark.sql.types.StructField("rate_pm",
          org.apache.spark.sql.types.LongType, nullable = false))))
    joinRates(df, strataCol, rates)
      .withColumn("sample_bucket",
        pmod(portable_hash(idCol.cast("string")), lit(1000L)))
      .filter(col("sample_bucket") < col("rate_pm"))
      .drop("__stratum")
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
  /** Label-balanced resampling by deterministic replication: every row of
    * label `l` is emitted `k_l = round(target / n_l)` times (integer
    * round-half-up, computed as `(2·target + n_l) div (2·n_l)`), where
    * `target` is the majority-class size — the standard upsampling move for
    * imbalanced classifier training, made reproducible (no RNG, no
    * with-replacement draws: the copy index is part of the output row).
    *
    * Balanced class sizes land within ±n_l/2 of `target` (the rounding
    * tolerance); exact-to-the-row balance would need a per-label order
    * statistic over the full label — a single-reducer sort of the majority
    * class at scale — which this operator deliberately avoids: the census
    * is the only shuffle, `k` rides a broadcast, and the replication is
    * row-local `explode(sequence(1, k))`. Compose with [[fixedCountByHash]]
    * to trim overshoot exactly when the cost is acceptable.
    */
  def balanceByReplication(
      df: DataFrame,
      idCol: Column,
      labelCol: Column): DataFrame = {
    val census = df.groupBy(labelCol.as("__lbl")).agg(count(lit(1)).as("__n"))
    val tgt = census.agg(max(col("__n")).as("__t"))
    val rates = census.crossJoin(broadcast(tgt))
      .withColumn("__k", expr("(2 * __t + __n) div (2 * __n)"))
    // null-safe: a null label is a census group of its own (see joinRates)
    df.join(broadcast(rates), labelCol <=> col("__lbl"))
      .select(idCol.as("id"), labelCol.as("label"),
        col("__n").as("n_orig"), col("__k").as("n_copies"),
        explode(sequence(lit(1L), col("__k"))).as("copy"))
  }

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

  /** Mixing to an EXPLICIT target distribution — the form a data team
    * actually specifies ("40% web, 30% code, 20% books, 10% wiki"), beside
    * the census-derived α-mix of [[temperatureMixByHash]]. Per stratum the
    * target count is `⌊budget·share/1000⌋` and the admit rate
    * `min(1000, 1000·target ÷ n_s)` — all 64-bit integer arithmetic, the
    * keep decided by the row's own id hash, so the sample is reproducible,
    * nested across budgets, and capped at the stratum's population (an
    * under-represented stratum saturates at 100% rather than inventing
    * rows; compose with [[balanceByReplication]] to upsample it). Strata
    * absent from `sharesPerMille` get rate 0.
    *
    * Scale shape: one census shuffle to strata cardinality, rates
    * broadcast back, keep row-local — the corpus never shuffles.
    */
  def mixToTarget(
      df: DataFrame,
      idCol: Column,
      strataCol: Column,
      sharesPerMille: Map[String, Int],
      budget: Long): DataFrame = {
    require(sharesPerMille.nonEmpty && sharesPerMille.values.forall(_ > 0) &&
      sharesPerMille.values.sum <= 1000,
      s"shares must be positive per-mille values summing to ≤ 1000: $sharesPerMille")
    require(budget > 0 && budget <= Long.MaxValue / 1000L,
      s"budget=$budget out of range")
    val census = df.groupBy(strataCol.as("__stratum"))
      .agg(count(lit(1)).as("__n"))
    val shareCol = sharesPerMille.foldLeft(lit(0L)) { case (acc, (s, pm)) =>
      when(col("__stratum") === s, lit(pm.toLong)).otherwise(acc)
    }
    val rates = census
      .withColumn("__share", shareCol)
      .selectExpr("__stratum",
        s"least(1000L, (1000L * ((${budget}L * __share) div 1000L)) div __n) AS rate_pm")
    joinRates(df, strataCol, rates)
      .withColumn("sample_bucket",
        pmod(portable_hash(idCol.cast("string")), lit(1000L)))
      .filter(col("sample_bucket") < col("rate_pm"))
      .drop("__stratum")
  }

  /** LEAKAGE-SAFE train/val/test split: the split is decided by the hash
    * of a document's canonical-content GROUP (min doc id per canonical
    * hash), never its own id — so exact/canonical duplicates can NEVER
    * straddle the boundary and leak training text into eval. `weights` are
    * per-mille shares in declaration order, summing to 1000; assignment is
    * by cumulative bucket range, so splits are reproducible, disjoint, and
    * (like the hash samplers) independent of partitioning or arrival
    * order. For NEAR-dup safety, feed any cluster label (e.g.
    * [[graft.dedup.Dedup.connectedComponents]] output) to [[splitByGroup]]
    * instead of the canonical group.
    *
    * Output: one row per input doc — `(doc_id, group_key, split)`.
    *
    * 100 TB shape: one partial-agg shuffle on the canonical hash for the
    * group election + the co-keyed join back (text never moves; the hash
    * stands in for it); the split decision itself is row-local.
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 1000 &&
      weights.forall(_._2 > 0),
      s"weights must be positive per-mille shares summing to 1000: $weights")
    // coalesce: a null text must still land in exactly one split — its
    // canonical hash is null, and a null join key would silently drop the
    // row from every split. Null texts share one group with empty texts
    // (conservative: grouping MORE together can never leak).
    val canon = df.select(idCol.as("doc_id"),
      md5(coalesce(graft.dedup.Dedup.canonicalize(textCol), lit(""))).as("__ch"))
    val groups = canon.groupBy(col("__ch")).agg(min(col("doc_id")).as("group_key"))
    splitByGroup(canon.join(groups, "__ch"), col("doc_id"), col("group_key"), weights)
  }

  /** The split decision of [[leakageSafeSplit]] over PRE-COMPUTED group
    * labels — feed it `(doc_id, cluster)` from
    * [[graft.dedup.Dedup.connectedComponents]] for near-dup-safe splits.
    * Row-local: bucket = portable_hash(group) mod 1000, assigned by
    * cumulative weight range. A NULL group label (not produced by any of
    * this library's group sources, but possible with caller-supplied
    * labels) hashes to a null bucket, which falls through every range test
    * into the LAST declared split — deterministic and leak-safe (all
    * null-group rows land together), but callers wanting a different
    * policy should coalesce their label first.
    */
  def splitByGroup(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 1000 &&
      weights.forall(_._2 > 0),
      s"weights must be positive per-mille shares summing to 1000: $weights")
    val bucket = pmod(portable_hash(groupCol.cast("string")), lit(1000L))
    val bounds = weights.scanLeft(0)(_ + _._2).tail
    val split = weights.zip(bounds).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.select(idCol.as("doc_id"), groupCol.as("group_key"), split.as("split"))
  }
}
