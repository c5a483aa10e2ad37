package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-distribution health reports. A natural-language corpus follows
  * Zipf's law (freq ∝ rank^-α with α ≈ 1); a scrape that deviates hard —
  * α far from 1, or a flat head — is template/boilerplate-dominated or
  * machine-generated, and the slope is the single number reviewers watch
  * across snapshot versions.
  */
object CorpusStats {

  /** Least-squares Zipf fit over the top-`topN` terms: one row with the
    * fitted exponent `alpha` (−slope of ln(count) ~ ln(rank)), the
    * intercept, and the term count fitted.
    *
    * Determinism contract (driver hash gate): both lns are rounded to 6 dp
    * and every regression sum runs in exact DECIMAL — parallel summation
    * order cannot change a digit; the only double ops are the final
    * num/den divisions, written in the identical association order on the
    * DuckDB side.
    *
    * 100 TB shape: one token-count shuffle (partial-agg combinable), then
    * `orderBy.limit` plans as TakeOrderedAndProject — per-partition top-N
    * heaps, never a global sort; everything after operates on `topN` rows.
    */
  /** Term-distribution drift between two corpus slices (reference vs
    * current): KL divergence in both directions over the union vocabulary
    * with add-one smoothing — the number a production pipeline alarms on
    * when a crawler update or an upstream feed silently changes what's
    * coming in.
    *
    * Determinism contract: KL(P‖Q) decomposes as
    * `Σ (a_t+1)·l_t / (A+V) + ln((B+V)/(A+V))` with
    * `l_t = ln((a_t+1)/(b_t+1))` — the per-term logs are rounded to 6 dp
    * and summed against integer counts in exact DECIMAL, so the only
    * doubles are the final division and the one global log, written in the
    * identical association order on the oracle side. The reverse direction
    * reuses `-l_t` (round is sign-symmetric in both engines).
    *
    * 100 TB shape: two token-count shuffles + one full-outer merge on the
    * term — all partial-agg friendly, vocabulary-sized, never corpus-sized;
    * the result is a single row.
    */
  def termDriftKl(ref: DataFrame, cur: DataFrame, textCol: Column): DataFrame = {
    def counts(df: DataFrame, name: String) =
      df.select(explode(split(textCol, " ")).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as(name))
    val j = counts(ref, "a").join(counts(cur, "b"), Seq("t"), "full_outer")
      .na.fill(0L, Seq("a", "b"))
    val dec6 = DecimalType(12, 6)
    val dec20 = DecimalType(20, 0)
    val l = round(log((col("a") + 1).cast("double") / (col("b") + 1).cast("double")), 6)
      .cast(dec6)
    val s = j.agg(
      count(lit(1)).as("n_terms"),
      sum(col("a")).as("na"), sum(col("b")).as("nb"),
      sum((col("a") + lit(1)).cast(dec20) * l).as("s_ab"),
      sum((col("b") + lit(1)).cast(dec20) * (lit(0).cast(dec6) - l)).as("s_ba"))
    val av = (col("na") + col("n_terms")).cast("double")
    val bv = (col("nb") + col("n_terms")).cast("double")
    s.select(
      col("n_terms"), col("na").as("n_ref_tokens"), col("nb").as("n_cur_tokens"),
      round(col("s_ab").cast("double") / av + log(bv / av), 6).as("kl_ref_cur"),
      round(col("s_ba").cast("double") / bv + log(av / bv), 6).as("kl_cur_ref"))
  }

  /** Per-group out-of-vocabulary rate against the corpus' own top-`topN`
    * vocabulary: the feed-health number that flags a source drifting into
    * unseen terms (spam, another language, encoding damage) before any
    * model sees it. `(group, n_tokens, n_oov, oov_ppm)` with
    * `oov_ppm = ⌊1e6·n_oov/n_tokens⌋` — integer-exact, hash-checkable.
    *
    * 100 TB shape: one global token-count shuffle (partial-agg) +
    * TakeOrdered for the vocabulary (topN rows, broadcast back), then one
    * per-group partial agg over the token scan with a row-local membership
    * probe — the corpus never shuffles by content.
    */
  def oovRate(
      df: DataFrame,
      groupCol: Column,
      textCol: Column,
      topN: Int): DataFrame = {
    require(topN >= 1, s"topN=$topN must be positive")
    val toks = df.select(groupCol.as("group"), explode(split(textCol, " ")).as("t"))
    val vocab = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t").asc).limit(topN)
      .select(col("t"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("t"), "left")
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm",
        floor(lit(1000000L) * col("n_oov") / col("n_tokens")).cast("long"))
  }

  def zipfFit(df: DataFrame, textCol: Column, topN: Int): DataFrame = {
    require(topN >= 2, s"topN=$topN: need at least 2 ranks to fit a line")
    val counts = df.select(explode(split(textCol, " ")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("t").asc).limit(topN)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("t").asc)))
    val dec6 = DecimalType(12, 6)
    val v = ranked.select(
      round(log(col("rank").cast("double")), 6).cast(dec6).as("x"),
      round(log(col("c").cast("double")), 6).cast(dec6).as("y"))
    val s = v.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx0"), sum(col("y")).as("sy0"),
      sum(col("x") * col("y")).as("sxy0"),
      sum(col("x") * col("x")).as("sxx0"))
    // re-narrow the aggregate types so every product below stays within
    // DECIMAL(38) EXACTLY (Spark would otherwise widen past 38 and round;
    // the casts are lossless: |ln| <= 16 bounds every sum well inside these
    // widths for any topN <= 9999)
    val nD  = col("n").cast(DecimalType(4, 0))
    val sx  = col("sx0").cast(DecimalType(14, 6))
    val sy  = col("sy0").cast(DecimalType(14, 6))
    val sxy = col("sxy0").cast(DecimalType(20, 12))
    val sxx = col("sxx0").cast(DecimalType(20, 12))
    val num = (nD * sxy - sx * sy).cast("double")
    val den = (nD * sxx - sx * sx).cast("double")
    val slope = num / den
    s.select(
      col("n").as("n_terms"),
      round(-slope, 6).as("alpha"),
      round((sy.cast("double") - slope * sx.cast("double"))
        / col("n").cast("double"), 6).as("intercept"))
  }
}
