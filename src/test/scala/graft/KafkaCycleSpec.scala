package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core.{ConsumedRecord, TaskMetadata}
import graft.sources.{TaskSource, TaskWriter}

/** The reference's `RetryQueueingTest.java` analog, environment-constrained:
  * no Kafka connector jar exists in this container and egress is disabled
  * (documented in README "Kafka path"), so the broker is a driver-side
  * queue delivering the EXACT Kafka record schema both ways — records enter
  * as the Kafka-source shape (ConsumedRecord) and failed tasks leave through
  * the real producer surface (`TaskWriter.toRetryShape`, sink-ready
  * key/value/headers/topic) before being "delivered" back. What this proves
  * end-to-end on a RUNNING streaming query:
  *
  *  - a failed task re-enters via the `<topic>-retry` subscription with
  *    `retry_count` advanced and a decodable dt_meta header;
  *  - backoff is honored: the redelivered task is not processed before its
  *    `scheduled_time_millis` (C1 scheduled execution over the retry hop);
  *  - every task completes at-least-once, exactly the delivery contract the
  *    reference asserts.
  */
object KafkaCycleSpec {
  // (key, retryCount, lateByMillis) per processed task — static so local-mode
  // executor closures hit the same instance
  val processed = new ConcurrentLinkedQueue[(Long, Long, Long)]()
  val retryProduced = new ConcurrentLinkedQueue[ConsumedRecord]()
  val requeued = new ConcurrentLinkedQueue[ConsumedRecord]()
  val offsets = new AtomicLong(1000L)
}

class KafkaCycleSpec extends SparkTestBase {

  test("kafkaOptions subscribes origin + retry + shaping topics in one subscription (S1)") {
    val opts = TaskSource.kafkaOptions("tasks", Some("tasks-retry"), Seq("tasks-shaping"), Some(500L))
    assert(opts("subscribe") == "tasks,tasks-retry,tasks-shaping")
    assert(opts("maxOffsetsPerTrigger") == "500")
    assert(opts("failOnDataLoss") == "false")
  }

  test("a failed task re-enters via the retry topic with backoff on a running query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    KafkaCycleSpec.processed.clear()
    KafkaCycleSpec.retryProduced.clear()
    KafkaCycleSpec.requeued.clear()

    val backoffMs = 400L
    val origin = "tasks"

    // origin records through the REAL producer surface: toKafkaShape writes
    // the dt_meta header exactly as the client would
    val t0 = System.currentTimeMillis()
    val originRows = spark.range(10)
      .select(col("id"),
        struct(
          lit(t0).as("timestamp_millis"),
          lit("graft-test").as("source_application_id"),
          lit("i-0").as("source_instance_id"),
          lit(0L).as("retry_count"),
          lit(0L).as("scheduled_time_millis")).as("meta"))
    val sinkShaped = TaskWriter.toKafkaShape(
      originRows, col("id"), col("id").cast("string"), col("meta"), origin)
    val originRecords = sinkShaped.collect().map { r =>
      val hdrs = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
        .map(h => h.getAs[String]("key") -> h.getAs[Array[Byte]]("value")).toMap
      ConsumedRecord(origin, 0, KafkaCycleSpec.offsets.incrementAndGet(), t0,
        r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"), hdrs)
    }

    val in = MemoryStream[ConsumedRecord]
    val q = in.toDS().writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[ConsumedRecord], _: Long) =>
      val now = System.currentTimeMillis()
      val withMeta = batch.toDF()
        .withColumn("meta", graft.functions.dt_meta_decode(element_at(col("headers"), TaskMetadata.HeaderKey)))
        .withColumn("k", col("key").cast("string").cast("long"))
      val due = withMeta.filter(col("meta.scheduled_time_millis") <= now)
      // C1: not-yet-due records go back to the broker untouched (the
      // consumer's scheduled-execution pause over the retry hop)
      withMeta.filter(col("meta.scheduled_time_millis") > now)
        .as[ConsumedRecord].collect().foreach(KafkaCycleSpec.requeued.add)
      // process: keys divisible by 3 fail on first delivery only
      val failures = due.filter(col("k") % 3 === 0 && col("meta.retry_count") === 0)
      due.filter(!(col("k") % 3 === 0 && col("meta.retry_count") === 0))
        .select(col("k"), col("meta.retry_count"), (lit(now) - col("meta.scheduled_time_millis")).as("late"))
        .as[(Long, Long, Long)].collect()
        .foreach(KafkaCycleSpec.processed.add)
      // the real retry producer shape: retry_count+1, scheduled = now+backoff
      TaskWriter.toRetryShape(
          failures, col("k"), col("value").cast("string"), col("meta"), origin,
          lit(now), lit(backoffMs))
        .collect().foreach { r =>
          val hdrs = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
            .map(h => h.getAs[String]("key") -> h.getAs[Array[Byte]]("value")).toMap
          assert(r.getAs[String]("topic") == "tasks-retry", "retry producer must target <topic>-retry")
          KafkaCycleSpec.retryProduced.add(ConsumedRecord(
            r.getAs[String]("topic"), 0, KafkaCycleSpec.offsets.incrementAndGet(), now,
            r.getAs[Array[Byte]]("key"), r.getAs[Array[Byte]]("value"), hdrs))
        }
      ()
    }.start()

    try {
      in.addData(originRecords.toIndexedSeq: _*)
      q.processAllAvailable()
      // broker loop: deliver retry-topic production + requeued records back
      // into the subscription until every task has completed
      val deadline = System.currentTimeMillis() + 30000
      while (KafkaCycleSpec.processed.size() < 10 && System.currentTimeMillis() < deadline) {
        val redeliver =
          (KafkaCycleSpec.retryProduced.asScala ++ KafkaCycleSpec.requeued.asScala).toVector
        KafkaCycleSpec.retryProduced.clear()
        KafkaCycleSpec.requeued.clear()
        if (redeliver.nonEmpty) in.addData(redeliver: _*)
        else Thread.sleep(50)
        q.processAllAvailable()
      }
      val done = KafkaCycleSpec.processed.asScala.toVector
      assert(done.map(_._1).toSet == (0L until 10L).toSet, s"all tasks must complete, got $done")
      val retried = done.filter(_._1 % 3 == 0)
      assert(retried.forall(_._2 == 1L), s"retried tasks must carry retry_count=1: $retried")
      assert(done.filter(_._1 % 3 != 0).forall(_._2 == 0L))
      // backoff honored: late = processedAt - scheduledTime >= 0 means the
      // task was never run before its scheduled time (the due filter), and
      // scheduling itself was now+backoff
      assert(retried.forall(_._3 >= 0L), s"task ran before its backoff deadline: $retried")
    } finally q.stop()
  }
}
