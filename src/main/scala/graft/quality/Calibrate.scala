package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-threshold calibration: instead of hand-picking a score cutoff,
  * derive the cutoff FROM the corpus so that an exact target fraction
  * survives — the way production quality gates are actually tuned (score the
  * corpus, look at the distribution, cut at a percentile).
  */
object Calibrate {

  /** Keep (at least) the top `keepFrac` of rows by `scoreCol`, with the
    * threshold derived from the corpus itself. The threshold is the score at
    * 0-based ascending rank `floor((1-keepFrac)·n)` — a DISCRETE quantile,
    * i.e. an actual score value, never an interpolated float — so the final
    * `score >= thr` gate compares two identically-computed doubles and can
    * never knife-edge between engines. Ties at the threshold are all kept
    * (survivor count may exceed `keepFrac·n` by the tie width; it is never
    * below).
    *
    * PRECISION CONTRACT: scores are compared at 6-dp fixed point — the
    * operator rounds `scoreCol` (half-up, Spark `round`) before BOTH the
    * histogram and the gate. For the engine's own scorers (e.g.
    * [[graft.functions.TextFunctions.quality_score]], already
    * `round(_, 6)`) the rounding is an exact identity, so thresholds and
    * survivor sets are unchanged; a caller passing a RAW continuous double
    * is quantized to the contract instead of silently driving the
    * cumulative window to corpus cardinality. The keep-fraction guarantee
    * holds at 6-dp granularity: rows whose ROUNDED score ties the
    * threshold are all kept. Callers who need finer-than-6-dp cutoffs on
    * live streams should use the fixed-width histogram form
    * ([[graft.streaming.StreamOps]]'s calibrated gate — the dq31 512-cell
    * shape) instead.
    *
    * 100 TB shape: the corpus is scanned once into a (score → count)
    * partial-agg shuffle; everything after operates on DISTINCT scores.
    * The 6-dp contract bounds the cardinality structurally (a score range
    * of width w has ≤ w·10⁶+1 distinct rounded values — 10⁶+1 for the
    * usual [0,1] scorers), so the unpartitioned cumulative window runs
    * over at most that many metadata rows — never over the corpus,
    * REGARDLESS of what the caller feeds in. The threshold row is
    * broadcast back; the corpus itself is filtered row-locally on
    * re-scan, no second shuffle.
    */
  def calibratedFilter(
      scored: DataFrame,
      scoreCol0: Column,
      keepFrac: Double): DataFrame = {
    // the precision contract (see scaladoc): all comparisons at 6-dp
    // fixed point — identity for the engine's own 6-dp scorers, a
    // cardinality guard for raw continuous inputs
    val scoreCol = round(scoreCol0, 6)
    // lower bound: below ~1.1e-16, (1.0 - keepFrac) rounds to exactly 1.0 in
    // IEEE double, the rank lands past every row and the gate would return
    // EMPTY instead of the top row — no real keep fraction is that small,
    // so reject rather than carry a clamp through the oracle replicas
    require(keepFrac >= 1e-9 && keepFrac <= 1.0,
      s"keepFrac=$keepFrac must be in [1e-9, 1]")
    // NaN scores are excluded from BOTH the histogram and the gate: Spark
    // orders NaN above every double, so enough NaN rows would make the
    // threshold itself NaN (keeping ONLY the NaN rows), and any NaN row
    // passes a >= gate — a score that is NaN carries no ranking signal.
    // Exclusion is phrased through nanvl so the score expression is
    // referenced ONCE: filter pushdown inlines a projected score back into
    // the predicate, and `isNotNull && !isnan` would evaluate an expensive
    // scorer twice per row (measured +36% on pq57)
    val byScore = scored.select(scoreCol.as("__s"))
      .filter(nanvl(col("__s"), lit(null).cast("double")).isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__c"))
    // cumulative count strictly below each distinct score (bounded rows)
    val cum = byScore.withColumn("__below",
      sum(col("__c")).over(Window.orderBy(col("__s"))) - col("__c"))
    val tot = byScore.agg(sum(col("__c")).as("__n"))
    val thr = cum.crossJoin(broadcast(tot))
      .withColumn("__r", floor((lit(1.0) - lit(keepFrac)) * col("__n")).cast("long"))
      .filter(col("__below") <= col("__r") &&
        col("__r") < col("__below") + col("__c"))
      .select(col("__s").as("thr"))
    // nanvl → -Infinity: one score reference (see above); a NaN maps below
    // every real threshold. Caveat (measure-zero²): a corpus whose REAL
    // scores include -Infinity at keepFrac=1 would see NaN rows pass the
    // -Inf threshold — real scorers are finite
    scored.crossJoin(broadcast(thr))
      .filter(nanvl(scoreCol, lit(Double.NegativeInfinity)) >= col("thr"))
  }
}
