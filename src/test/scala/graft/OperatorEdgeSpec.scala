package graft

import org.apache.spark.sql.functions._

import graft.api._
import graft.core._
import graft.operators.{PerKeyQuota, RateLimit}

class OperatorEdgeSpec extends SparkTestBase {

  test("null/empty keys scatter round-robin instead of pinning one partition (O2)") {
    import spark.implicits._
    val tasks = spark.createDataset((0 until 200).map { i =>
      val key = if (i % 2 == 0) Array.emptyByteArray else s"k${i % 5}".getBytes("UTF-8")
      Task(TaskMetadata(timestampMillis = i.toLong), key, i)
    })
    val parts = new TaskPipeline(tasks).orderedPerKey(8).tasks
      .mapPartitions { it =>
        val emptyKeyCount = it.count(_.key.isEmpty)
        Iterator.single(emptyKeyCount)
      }.collect()
    // 100 empty-key tasks over 8 partitions: round-robin means no partition
    // holds them all (hash-on-null would put 100 in one partition)
    assert(parts.max < 100, s"null keys pinned to one partition: ${parts.toSeq}")
    assert(parts.sum == 100)
  }

  test("quota callback failure completes tasks without shaping (E4)") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir)
    val bad = PerKeyQuota.violatingKeysExact(e, col("user_id"), col("ts"), "1 day", 6L)
    val badKeys = bad.as[Long].collect().toSet
    assert(badKeys.size >= 2, "fixture needs >=2 violating keys")
    val failFor = badKeys.head
    val (ok, shaped) = PerKeyQuota.routeWithCallback(
      e, col("user_id"), bad,
      k => if (k.asInstanceOf[Long] == failFor) throw new RuntimeException("cb boom")
           else "events-shaping")
    // the failed key's records are processed (not shaped, not lost)
    assert(shaped.filter(col("user_id") === failFor).count() == 0)
    assert(ok.filter(col("user_id") === failFor).count() ==
      e.filter(col("user_id") === failFor).count())
    // other violating keys still shape, with the chosen topic attached
    assert(shaped.filter(col("shaping_topic") === "events-shaping").count() == shaped.count())
    assert(ok.count() + shaped.count() == e.count())
  }

  test("tri-state counts expose the processed/retry/discard/error metrics") {
    import spark.implicits._
    val tasks = spark.createDataset((0 until 100).map(i =>
      Task(TaskMetadata(), s"k$i".getBytes("UTF-8"), i)))
    val p = new TaskPipeline(tasks).thenProcess(new RecordProcessor[Int, Int] {
      def process(t: Task[Int]): ProcessResult[Int] = t.value % 4 match {
        case 0 => ProcessResult.Discard
        case 1 => ProcessResult.Retry
        case 2 => throw new IllegalStateException("boom")
        case _ => ProcessResult.Processed(t.value)
      }
    })
    assert(p.counts == Map("processed" -> 25L, "retry" -> 25L, "discard" -> 25L, "error" -> 25L))
  }

  test("rate limiter trigger math (C2): -1 unlimited, 0 pause, positive bounded") {
    assert(RateLimit.maxOffsetsPerTrigger(-1L, 8, 1).isEmpty)
    assert(RateLimit.maxOffsetsPerTrigger(0L, 8, 1).contains(0L))
    assert(RateLimit.maxOffsetsPerTrigger(100L, 8, 2).contains(1600L))
    assert(RateLimit.MaxRatePerPartition == 1000000L)
  }

  test("maxOffsetsPerTrigger clamps to MaxRatePerPartition and saturates instead of wrapping") {
    // rate above the reference bound is clamped, not honored
    assert(RateLimit.maxOffsetsPerTrigger(2000000L, 2, 1).contains(2000000L))
    // a huge 'effectively unlimited' rate used to overflow to Some(0) = full pause
    val huge = RateLimit.maxOffsetsPerTrigger(Long.MaxValue, 1000000, 1000000L)
    assert(huge.exists(_ > 0L), s"huge rate must not collapse to a pause: $huge")
    intercept[IllegalArgumentException] { RateLimit.maxOffsetsPerTrigger(5L, 0, 1) }
  }

  test("blockKeys keeps null-keyed rows and rejects null blocklist entries (F1)") {
    import spark.implicits._
    val df = Seq(Option(1L), Option(2L), None).toDF("k")
    val kept = graft.operators.KeyBlocking.blockKeys(df, col("k"), Seq(1L))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSet
    assert(kept == Set(Some(2L), None),
      s"null key is not blocklisted and must survive: $kept")
    intercept[IllegalArgumentException] {
      graft.operators.KeyBlocking.blockKeys(df, col("k"), Seq(1L, null))
    }
  }

  test("highWatermark holds at an offset whose completion flag is NULL (O1)") {
    import spark.implicits._
    val df = Seq((0, 1L, Option(true)), (0, 2L, None: Option[Boolean]), (0, 3L, Option(true)))
      .toDF("p", "off", "done")
    val row = graft.operators.CommitControl
      .highWatermark(df, col("p"), col("off"), col("done")).head()
    assert(row.getAs[Long]("high_watermark") == 1L,
      "unknown completion must hold the watermark like an incomplete offset")
    assert(row.getAs[Long]("n_complete") == 2L)
  }

  test("due/notYetDue PARTITION the input: a null-scheduled task carries forward (C1)") {
    import spark.implicits._
    val df = Seq(Option(5L), Option(50L), None).toDF("sched")
    val due = graft.operators.Scheduled.due(df, col("sched"), asOfMillis = 10L).count()
    val later = graft.operators.Scheduled.notYetDue(df, col("sched"), asOfMillis = 10L).count()
    assert(due == 1 && later == 2 && due + later == df.count(),
      s"due=$due notYetDue=$later must cover all 3 rows")
  }

  test("assignBatches and compactBatch validate their inputs loudly (A1/A2)") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "value")
    intercept[IllegalArgumentException] {
      graft.operators.Batching.assignBatches(df, col("k"), Seq(col("value")), capacity = 0)
    }
    // an expression key aliased to an EXISTING column would silently clobber
    // the payload source before it resolves
    intercept[IllegalArgumentException] {
      graft.operators.Compaction.compactBatch(
        df, keyCols = Seq((col("k") + 1).as("value")),
        rankCols = Seq(col("k")), payload = Seq(col("value")))
    }
  }

  test("linearQualityScore is immune to duplicated weight rows") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val w = Seq((0, 1000000L), (1, 2000000L)).toDF("b", "w_fp")
    val once = graft.quality.Importance.linearQualityScore(
      docs, col("doc_id"), col("text"), w, buckets = 2).collect().map(_.toSeq).toSet
    val dup = graft.quality.Importance.linearQualityScore(
      docs, col("doc_id"), col("text"), w.unionAll(w), buckets = 2)
      .collect().map(_.toSeq).toSet
    assert(once == dup, "duplicate (b, w_fp) rows must not inflate n_feats/sum_fp")
  }

  test("decodeFeatures validates stride and dim on the driver") {
    import spark.implicits._
    val assets = Seq((1L, Array[Byte](1, 2, 3), 4L)).toDF("asset_id", "data", "nf")
      .select(col("asset_id"), col("data"),
        struct(col("nf").as("n_frames")).as("meta"))
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.decodeFeatures(assets, stride = 0, dim = 4)
    }
    intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.decodeFeatures(assets, stride = 2, dim = -1)
    }
  }
}
