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
  * fold to the identical state because the merge dedupes by id (keeping
  * the highest score seen) before re-ranking.
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
          // a re-delivered doc must not occupy two slots EVEN IF its score
          // changed between deliveries: dedupe by id (keeping the highest
          // score seen — deterministic regardless of arrival order), not by
          // exact (score, id) pair, so a rescored re-delivery can't
          // double-count and evict a legitimate document
          val merged = (state.getOption.getOrElse(Seq.empty) ++
              rows.map(r => (r._3, r._2)))
            .groupBy(_._2).valuesIterator.map(_.maxBy(_._1)).toSeq
            .sortBy { case (s, i) => (-s, i) }
            .take(cap)
          state.update(merged)
          (src, merged.map(_._2))
      }
      .toDF("source", "admitted")
  }
}
