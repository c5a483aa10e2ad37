package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.similarity.Pq
import graft.streaming.StreamOps

/** The self-indexing streaming near-dup flagger: unbounded history as
  * disk-resident PQ-signature segments, bounded (zero) state-store state.
  * Contract under test: the flagged set is batch-split-INVARIANT — for any
  * id-ordered split into micro-batches it equals the batch self-join with
  * `h.id < o.id` — and a replayed batch is idempotent (reads only
  * strictly-earlier segments, overwrites its own).
  */
class SelfIndexingFlaggerSpec extends SparkTestBase {

  private val cb = Pq.syntheticCodebooks(m = 8, k = 16, w = 8)

  private def expectedFlagged(): Set[Long] = {
    val bs = Pq.codeBandSignatures(
      Tables.embeddings(spark, sfDir), col("vec_id"), col("embedding"), cb, bands = 2)
    bs.as("o")
      .join(bs.select(col("band"), col("band_sig"), col("id").as("h_id")).as("h"),
        Seq("band", "band_sig"))
      .filter(col("h_id") < col("id"))
      .select(col("id")).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  test("streamed flags equal the batch self-join under random id-ordered splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val expect = expectedFlagged()
    assert(expect.nonEmpty && expect.size < 500,
      s"fixture must flag a non-trivial subset to bite, got ${expect.size}")

    val rows = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)

    val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)
    for (round <- 0 until 2) {
      val rnd = new scala.util.Random(seed + round)
      // random id-ordered split into 3–6 non-empty batches
      val nCuts = 2 + rnd.nextInt(4)
      val cuts = (Seq.fill(nCuts)(1 + rnd.nextInt(rows.length - 1)).distinct.sorted
        :+ rows.length).prepended(0)
      val batches = cuts.sliding(2).map { case Seq(a, b) => rows.slice(a, b) }
        .filter(_.nonEmpty).toSeq

      val indexDir = Files.createTempDirectory(s"graft-selfidx-$round").toString + "/idx"
      val flagged = new ConcurrentLinkedQueue[Long]()
      val in = MemoryStream[(Long, Array[Float])]
      val q = StreamOps.selfIndexingPqFlagger(
        in.toDF().toDF("vec_id", "embedding"),
        col("vec_id"), col("embedding"), indexDir, cb, bands = 2,
        checkpoint = Files.createTempDirectory(s"graft-selfidx-ckpt-$round").toString) {
        flags => flags.collect().foreach(r => flagged.add(r.getLong(0)))
      }
      try {
        batches.foreach { chunk => in.addData(chunk); q.processAllAvailable() }
      } finally q.stop()

      val got = flagged.asScala.toSet
      assert(got == expect,
        s"round $round (${batches.size} batches): only-stream=${(got -- expect).take(5)} " +
          s"only-batch=${(expect -- got).take(5)}")
    }
  }

  test("a replayed batch is idempotent: same flags, segment overwritten not duplicated") {
    import spark.implicits._
    val rows = Tables.embeddings(spark, sfDir)
    val indexDir = Files.createTempDirectory("graft-selfidx-replay").toString + "/idx"

    val b0 = rows.filter(col("vec_id") < 250)
    val b1 = rows.filter(col("vec_id") >= 250)
    def run(batch: org.apache.spark.sql.DataFrame, id: Long): Set[Long] =
      StreamOps.flagAndIndexPqBatch(batch, id, col("vec_id"), col("embedding"),
          indexDir, cb, bands = 2)
        .as[Long].collect().toSet

    val f0 = run(b0, 0L); val f1 = run(b1, 1L)
    // the at-least-once crash case: batch 1 replays — history must exclude
    // its own previous segment, so flags and index size are unchanged
    val f1replay = run(b1, 1L)
    assert(f1replay == f1, "replay changed the flagged set")
    val segRows = spark.read.parquet(indexDir)
    assert(segRows.count() == 500 * 2,
      s"index must hold exactly rows×bands signatures, got ${segRows.count()}")
    assert(segRows.select("batch").distinct().count() == 2)
    // union across batches still equals the global contract
    assert((f0 ++ f1) == expectedFlagged(), "two-batch run diverged from the batch self-join")
  }

  test("text (minhash/LSH) self-indexing flagger matches the batch self-join") {
    import spark.implicits._
    val d = Tables.documents(spark, sfDir)
    val indexDir = Files.createTempDirectory("graft-selfidx-text").toString + "/idx"

    // batch expectation: dq17's banding, flagged iff an EARLIER doc shares a band
    val wide = d.select(col("doc_id").as("id"),
        graft.functions.minhash_sigs(col("text"), 5, 16).as("__mh"))
      .filter(col("__mh").isNotNull)
      .select(col("id") +: (0 until 16).map(i => col("__mh")(i).as(s"mh$i")): _*)
    val bs = graft.dedup.Dedup.lshBandSignaturesWide(wide, 16, 4)
    val expect = bs.as("o")
      .join(bs.select(col("band"), col("band_sig"), col("id").as("h_id")).as("h"),
        Seq("band", "band_sig"))
      .filter(col("h_id") < col("id"))
      .select(col("id")).distinct().as[Long].collect().toSet
    assert(expect.nonEmpty, "fixture must flag a non-trivial text subset")

    val n = d.agg(max(col("doc_id"))).head.getLong(0)
    val got = Seq(
      d.filter(col("doc_id") < n / 3) -> 0L,
      d.filter(col("doc_id") >= n / 3 && col("doc_id") < 2 * n / 3) -> 1L,
      d.filter(col("doc_id") >= 2 * n / 3) -> 2L
    ).flatMap { case (batch, id) =>
      StreamOps.flagAndIndexTextBatch(batch, id, col("doc_id"), col("text"),
        indexDir, k = 16, bands = 4, shingleSize = 5).as[Long].collect()
    }.toSet
    assert(got == expect,
      s"only-stream=${(got -- expect).take(5)} only-batch=${(expect -- got).take(5)}")
  }

  test("the history probe broadcasts the batch side — history is scanned, never shuffled") {
    val rows = Tables.embeddings(spark, sfDir)
    val indexDir = Files.createTempDirectory("graft-selfidx-plan").toString + "/idx"
    StreamOps.flagAndIndexPqBatch(rows.filter(col("vec_id") < 250), 0L,
      col("vec_id"), col("embedding"), indexDir, cb, bands = 2).collect()
    val banded = Pq.codeBandSignatures(
      rows.filter(col("vec_id") >= 250), col("vec_id"), col("embedding"), cb, bands = 2)
    val plan = StreamOps.historyCheck(banded, indexDir, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"history probe must broadcast the batch side, plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"history probe must never shuffle the history side, plan:\n$plan")
  }

  test("segment compaction preserves flags and bounds the file count") {
    import spark.implicits._
    val rows = Tables.embeddings(spark, sfDir)
    val indexDir = Files.createTempDirectory("graft-selfidx-compact").toString + "/idx"
    def run(pred: org.apache.spark.sql.Column, id: Long): Set[Long] =
      StreamOps.flagAndIndexPqBatch(rows.filter(pred), id,
          col("vec_id"), col("embedding"), indexDir, cb, bands = 2)
        .as[Long].collect().toSet

    run(col("vec_id") < 150, 0L)
    run(col("vec_id") >= 150 && col("vec_id") < 300, 1L)
    run(col("vec_id") >= 300 && col("vec_id") < 400, 2L)
    // compact everything strictly below the last committed batch (2): only
    // the latest batch may replay, so folding 0..1 into batch=1 is safe
    StreamOps.compactIndexSegments(spark, indexDir, upToBatch = 1L)
    val segs = spark.read.parquet(indexDir).select("batch").distinct()
      .as[Long].collect().sorted
    assert(segs.toSeq == Seq(1L, 2L), s"expected segments [1,2], got ${segs.toSeq}")
    // idempotent re-run (the crash-between-write-and-delete recovery path)
    StreamOps.compactIndexSegments(spark, indexDir, upToBatch = 1L)
    assert(spark.read.parquet(indexDir).count() == 400 * 2,
      "compaction must keep exactly rows×bands signatures")
    // the next batch's flags are unchanged by compaction: same semantics
    // as an uncompacted twin index fed the same four batches
    val twinDir = Files.createTempDirectory("graft-selfidx-twin").toString + "/idx"
    def runTwin(pred: org.apache.spark.sql.Column, id: Long): Set[Long] =
      StreamOps.flagAndIndexPqBatch(rows.filter(pred), id,
          col("vec_id"), col("embedding"), twinDir, cb, bands = 2)
        .as[Long].collect().toSet
    runTwin(col("vec_id") < 150, 0L)
    runTwin(col("vec_id") >= 150 && col("vec_id") < 300, 1L)
    runTwin(col("vec_id") >= 300 && col("vec_id") < 400, 2L)
    val afterCompact = run(col("vec_id") >= 400, 3L)
    val afterPlain = runTwin(col("vec_id") >= 400, 3L)
    assert(afterCompact == afterPlain, "compaction changed a later batch's flags")
  }
}
