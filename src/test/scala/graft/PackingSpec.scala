package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Packing

/** Sequence packing ([[graft.pipeline.Packing]]): the window plan equals a
  * sequential per-stream fold, pack ids follow the concat-and-chunk
  * formula, and every non-final pack's content spans its boundary.
  */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private val budget = 256L

  test("assignPacks == sequential fold reference, per stream") {
    val d = Tables.documents(spark, sfDir)
    val toks = size(filter(split(col("text"), " "), w => length(w) > 0))
      .cast("long")
    val got = Packing.assignPacks(
        d.select(col("doc_id"), toks.as("toks")),
        col("doc_id"), col("toks"), streams = 4, budgetTokens = budget)
      .select("doc_id", "toks", "stream", "offset", "pack")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length > 0)
    got.groupBy(_._3).foreach { case (stream, rows) =>
      var off = 0L
      rows.sortBy(_._1).foreach { case (id, t, _, o, p) =>
        assert(id % 4 === stream, s"doc $id in wrong stream $stream")
        assert(o === off, s"doc $id: offset $o != fold $off")
        assert(p === off / budget, s"doc $id: pack $p != ${off / budget}")
        off += t
      }
    }
    // multiple packs and multiple streams must actually arise
    assert(got.map(_._5).distinct.length > 4, "fixture too small to pack")
    assert(got.map(_._3).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L))
  }

  test("packSummary: every non-final pack spans its boundary; determinism across runs") {
    val d = Tables.documents(spark, sfDir)
    val toks = size(filter(split(col("text"), " "), w => length(w) > 0))
      .cast("long")
    val assigned = Packing.assignPacks(
      d.select(col("doc_id"), toks.as("toks")),
      col("doc_id"), col("toks"), streams = 4, budgetTokens = budget)
    val sum = Packing.packSummary(assigned, col("toks"), budget)
      .select("stream", "pack", "n_docs", "tokens", "fill_ratio")
      .as[(Long, Long, Long, Long, Double)].collect()
    val lastPack = sum.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    // a non-final pack contains the doc that crosses its upper boundary:
    // first-offset + token mass reaches past (pack+1)*budget
    val firstOff = assigned.groupBy(col("stream"), col("pack"))
      .agg(min(col("offset")).as("o"))
      .as[(Long, Long, Long)].collect()
      .map { case (s, p, o) => (s, p) -> o }.toMap
    sum.foreach { case (s, p, nDocs, tokens, fill) =>
      assert(nDocs > 0 && tokens > 0)
      assert(fill === math.round(tokens.toDouble / budget * 1e6) / 1e6)
      if (p != lastPack(s))
        assert(firstOff((s, p)) + tokens >= (p + 1) * budget,
          s"non-final pack ($s,$p) fails to span its boundary")
    }
    // byte-identical packing on a re-run (the lineage-audit property)
    val again = Packing.assignPacks(
        d.select(col("doc_id"), toks.as("toks")),
        col("doc_id"), col("toks"), streams = 4, budgetTokens = budget)
      .select("doc_id", "stream", "offset", "pack")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(again === assigned.select("doc_id", "stream", "offset", "pack")
      .as[(Long, Long, Long, Long)].collect().toSet)
  }
}
