package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN evaluation as a public API: the recall numbers the specs assert
  * internally (DedupSpec floors for pq09/pq13/pq14/pq35), importable so a
  * user can measure THEIR index against ground truth before trusting it —
  * the similarity-search counterpart of `graft.testing.GuaranteeSuite`.
  *
  * Both entry points take the `(query_id, nbr_id, ...)` result shape every
  * [[Knn]] operator emits and are fully distributed (one co-keyed join +
  * partial agg) — usable on full-scale indexes, unlike a driver-side set
  * compare.
  */
object Eval {

  /** Per-query recall of `approx` against `exact` ground truth: the
    * fraction of each query's exact neighbor set the approximate result
    * recovered. Extra approximate neighbors (precision misses) do not count
    * against recall — the standard ANN measurand.
    */
  def recallPerQuery(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("nbr_id")).distinct()
      .withColumn("__hit", lit(1L))
    val e = exact.select(col("query_id"), col("nbr_id")).distinct()
    e.join(a, Seq("query_id", "nbr_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_truth"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / col("n_truth"))
  }

  /** One-row summary over [[recallPerQuery]]: macro recall (mean of
    * per-query recalls — every query votes equally), micro recall (pooled
    * hits over pooled truth — large-k queries weigh more), and the minimum
    * per-query recall (the worst query, the number an SLO cares about).
    */
  def recallSummary(approx: DataFrame, exact: DataFrame): DataFrame =
    recallPerQuery(approx, exact).agg(
      count(lit(1)).as("n_queries"),
      avg(col("recall")).as("macro_recall"),
      (sum(col("n_hit")).cast("double") / sum(col("n_truth"))).as("micro_recall"),
      min(col("recall")).as("min_recall"))

  /** Where does each query's TRUE top-1 land in the approximate ranking?
    * `(query_id, true_top1, rank_found)` with `rank_found = 0` when the
    * approximate list missed it entirely — the per-query integer artifact
    * behind MRR, exact and hash-checkable (unlike the float summary).
    * `approx` is the standard `(query_id, rank, nbr_id)` result shape;
    * `exactTop1` is `(query_id, nbr_id)` ground truth.
    */
  def rankOfTruth(approx: DataFrame, exactTop1: DataFrame): DataFrame =
    exactTop1.select(col("query_id"), col("nbr_id"))
      .join(approx.select(col("query_id"), col("nbr_id"), col("rank")),
        Seq("query_id", "nbr_id"), "left")
      .select(col("query_id"), col("nbr_id").as("true_top1"),
        coalesce(col("rank"), lit(0)).cast("int").as("rank_found"))

  /** Mean reciprocal rank over [[rankOfTruth]] (misses contribute 0), plus
    * the hit count — the leaderboard scalar for a retrieval tier.
    */
  def mrrSummary(ranks: DataFrame): DataFrame =
    ranks.agg(
      count(lit(1)).as("n_queries"),
      sum(when(col("rank_found") > 0, 1L).otherwise(0L)).as("n_found"),
      avg(when(col("rank_found") > 0, lit(1.0) / col("rank_found"))
        .otherwise(lit(0.0))).as("mrr"))
}
