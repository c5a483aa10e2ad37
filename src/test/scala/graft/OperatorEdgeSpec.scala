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
    assert(p.counts == Map("processed" -> 25L, "retry" -> 25L, "discarded" -> 25L, "error" -> 25L))
  }

  test("rate limiter trigger math (C2): -1 unlimited, 0 pause, positive bounded") {
    assert(RateLimit.maxOffsetsPerTrigger(-1L, 8, 1).isEmpty)
    assert(RateLimit.maxOffsetsPerTrigger(0L, 8, 1).contains(0L))
    assert(RateLimit.maxOffsetsPerTrigger(100L, 8, 2).contains(1600L))
    assert(RateLimit.MaxRatePerPartition == 1000000L)
  }
}
