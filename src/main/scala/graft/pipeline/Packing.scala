package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining batch preparation — the
  * concat-and-chunk discipline (GPT-2/3, Raffel 2020 §2.3 all train on
  * contiguous `budget`-token windows over concatenated documents): lay
  * documents head-to-tail in a deterministic order and assign each one to
  * the fixed-size pack its FIRST token lands in. Deterministic by
  * construction — same corpus, same ids ⇒ byte-identical packing on every
  * run, which is what makes training-data lineage auditable.
  *
  * 100 TB shape: packing inherently needs a total order, and a single
  * global sort of the corpus is the thing we never do. Instead the corpus
  * is split into `streams` INDEPENDENT streams (deterministic on the id),
  * each packed in parallel: one shuffle on the stream key, one
  * within-stream sort — choose `streams` so a stream's (id, tokens) pairs
  * fit an executor's sort buffer (the narrow projection is ~16 bytes/doc;
  * 1024 streams cover ~10^12 docs). Per-stream cumulative offsets come
  * from ONE running-sum window — no iteration, no driver state; document
  * text never enters the shuffle (join the assignment back by id, the
  * [[Curation]] posture).
  */
object Packing {

  /** Adds (`streamCol`, `offsetCol`, `packCol`) to `df`: the document's
    * stream, its first-token offset within the stream's concatenation,
    * and `floor(offset / budgetTokens)` — the pack its first token lands
    * in. Order within a stream is ascending `idCol` (deterministic);
    * streams are `pmod(id, streams)`.
    */
  def assignPacks(
      df: DataFrame,
      idCol: Column,
      tokensCol: Column,
      streams: Int,
      budgetTokens: Long,
      streamCol: String = "stream",
      offsetCol: String = "offset",
      packCol: String = "pack"): DataFrame = {
    require(streams > 0, s"streams=$streams must be positive")
    require(budgetTokens > 0, s"budgetTokens=$budgetTokens must be positive")
    graft.functions.requireIntegralId(df, idCol, "assignPacks")
    val w = Window.partitionBy(col(streamCol)).orderBy(idCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(streamCol, pmod(idCol.cast("long"), lit(streams.toLong)))
      .withColumn(offsetCol,
        coalesce(sum(tokensCol.cast("long")).over(w), lit(0L)))
      .withColumn(packCol, floor(col(offsetCol) / budgetTokens))
  }

  /** Per-(stream, pack) audit: document count, token mass, and the
    * 6-dp fill ratio against the budget (>1 means the pack's LAST doc
    * spills into the next window — the concat-and-chunk contract; <1
    * only on a stream's final pack).
    */
  def packSummary(
      assigned: DataFrame,
      tokensCol: Column,
      budgetTokens: Long,
      streamCol: String = "stream",
      packCol: String = "pack"): DataFrame =
    assigned.groupBy(col(streamCol), col(packCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokensCol.cast("long")).as("tokens"))
      .withColumn("fill_ratio",
        round(col("tokens").cast("double") / budgetTokens, 6))
}
