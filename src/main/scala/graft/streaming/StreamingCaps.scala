package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming form of the per-source document cap
  * ([[graft.pipeline.Curation.perSourceCap]], pq55): admission while the
  * crawl is still arriving. Per source, the keyed state is the current
  * top-`cap` (score desc, id asc) set — the same bounded heap the batch
  * aggregate folds, held in the checkpointed state store; each trigger
  * emits the source's CURRENT admitted ids (Update mode), so the last
  * emission per source equals the batch cap over everything seen so far
  * (asserted in StreamingSpec).
  *
  * Scale/state shape: O(cap) entries per source — bounded regardless of
  * stream volume — and re-delivered documents (at-least-once ingestion)
  * fold to the identical state because the merge dedupes exact (score, id)
  * pairs before re-ranking.
  */
object StreamingCaps {

  def perSourceCapStream(
      df: DataFrame,
      idCol: Column,
      sourceCol: Column,
      scoreCol: Column,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap=$cap must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(sourceCol.cast("string").as("source"),
        idCol.cast("long").as("id"), scoreCol.cast("double").as("s"))
      .filter(col("source").isNotNull && col("id").isNotNull &&
        col("s").isNotNull && !isnan(col("s"))) // same drops as top_k_by
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[(Double, Long)], (String, Seq[Long])](
        GroupStateTimeout.NoTimeout) {
        (src, rows, state) =>
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._3, r._2)))
            .distinct // a re-delivered doc must not occupy two slots
            .sortBy { case (s, i) => (-s, i) }
            .take(cap)
          state.update(merged)
          (src, merged.map(_._2))
      }
      .toDF("source", "admitted")
  }
}
