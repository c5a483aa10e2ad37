package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: every production corpus is re-crawled and
  * re-shipped; the pipeline has to know what changed between version N-1 and
  * N without reprocessing the world.
  */
object Snapshots {

  /** Per-document diff between two corpus snapshots: `added` (only in new),
    * `removed` (only in old), `changed` (both, content hash differs),
    * `unchanged`. Downstream incremental runs reprocess `added ∪ changed`
    * and tombstone `removed` — the standard change-data-capture contract.
    *
    * 100 TB shape: ONE co-partitioned full-outer join on the id; the 128-bit
    * content hash stands in for the text on both sides, so document bodies
    * never shuffle. With both snapshots stored bucketed by id
    * ([[graft.sources.Bucketing]]) the join plans with zero Exchange.
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: Column,
      contentCol: Column): DataFrame = {
    // presence is carried EXPLICITLY, never inferred from hash nullability:
    // md5(NULL content) is null, so a hash-null test would misread a
    // null-content doc present only in the old snapshot as "added" (its
    // tombstone never issues and downstream reprocesses a doc that no
    // longer exists). The change test is null-safe for the same reason.
    val a = oldDf.select(idCol.as("doc_id"), md5(contentCol).as("old_hash"),
      lit(true).as("__in_old"))
    val b = newDf.select(idCol.as("doc_id"), md5(contentCol).as("new_hash"),
      lit(true).as("__in_new"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("old_hash") <=> col("new_hash")), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** The reprocess set for an incremental run: ids whose content is new or
    * different in the new snapshot (`added ∪ changed`). Same single join as
    * [[diff]]; kept separate so callers can semi-join the new snapshot
    * against it without materializing the full status table.
    */
  def reprocessSet(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: Column,
      contentCol: Column): DataFrame =
    diff(oldDf, newDf, idCol, contentCol)
      .filter(col("status").isin("added", "changed"))
      .select(col("doc_id"))
}
