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
}
