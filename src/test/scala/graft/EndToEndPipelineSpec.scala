package graft

import org.apache.spark.sql.functions._

import graft.api._
import graft.core._
import graft.operators.{Compaction, PerKeyQuota}
import graft.sources.{TaskSource, TaskWriter}
import graft.streaming.RetryLoop

/** The full §3.1 query lifecycle, composed end-to-end from the engine's own
  * operators (the Spark trace of `SubscriptionBuilder…buildAndStart()`,
  * SURVEY.md §3.1): source → metadata extraction → key blocking → quota
  * routing → per-key ordering → tri-state processing with retry-to-
  * convergence → producer-shaped sink. Asserts global accounting: every
  * input record ends in exactly one terminal disposition.
  */
class EndToEndPipelineSpec extends SparkTestBase {

  test("full pipeline: consume -> block -> quota -> process -> retry -> sink") {
    import spark.implicits._

    val records = TaskSource.fromEvents(spark, sfDir)
    val total = records.count()

    // F1: block two keys
    val blocked = Seq("1", "2").map(_.getBytes("UTF-8"))
    val extractor = new TaskExtractor[String] {
      def extract(r: ConsumedRecord): Task[String] = Task(
        TaskMetadata(timestampMillis = r.timestampMillis),
        r.key, new String(r.value, "UTF-8"))
    }
    val pipeline = TaskPipeline.consuming(records, extractor)
      .blockKeys(blocked)
      .orderedPerKey(4) // O2
    val afterBlock = pipeline.tasks.count()
    assert(afterBlock < total)

    // A4: quota routing on the task stream's keys (exact path)
    val asDf = pipeline.tasks.map(t => new String(t.key, "UTF-8").toLong).toDF("user_id")
    val eventsDf = Tables.events(spark, sfDir)
      .join(asDf.distinct(), "user_id") // events surviving the blocklist
    val bad = PerKeyQuota.violatingKeysExact(eventsDf, col("user_id"), col("ts"), "1 day", 6L)
    val (okDf, shapedDf) = PerKeyQuota.route(eventsDf, col("user_id"), bad)
    assert(okDf.count() + shapedDf.count() == eventsDf.count())

    // E1/E3: process with flaky processor, retry to convergence
    val processor = new RecordProcessor[String, Int] {
      def process(t: Task[String]): ProcessResult[Int] = {
        val k = new String(t.key, "UTF-8").toLong
        if (t.metadata.retryCount < k % 3) ProcessResult.Retry
        else if (k % 17 == 0) ProcessResult.Discard
        else ProcessResult.Processed(t.value.length)
      }
    }
    val out = RetryLoop.processWithRetries(
      pipeline.tasks, processor, backoffMillis = 100L, maxRetries = 5L, nowMillis = 0L)
    val accounted = out.processed.count() + out.discarded.count() +
      out.errored.count() + out.gaveUp.count()
    assert(accounted == afterBlock, s"lost tasks: $accounted != $afterBlock")
    assert(!out.processed.isEmpty && !out.discarded.isEmpty)
    assert(out.gaveUp.isEmpty) // k % 3 <= 2 < maxRetries: everything converges
    out.unpersist()

    // S3: survivors leave through the producer shape with decodable headers
    val sink = TaskWriter.toKafkaShape(
      Tables.events(spark, sfDir).limit(50).withColumn("meta", struct(
        unix_millis(col("ts")).as("timestamp_millis"),
        lit("e2e").as("source_application_id"),
        lit("i-0").as("source_instance_id"),
        lit(0L).as("retry_count"),
        lit(0L).as("scheduled_time_millis"))),
      col("user_id"), col("props"), col("meta"), "events-out")
    assert(sink.count() == 50)
    val hdr = sink.head().getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers").head
    assert(MetaCodec.decode(hdr.getAs[Array[Byte]](1)).sourceApplicationId == "e2e")
  }
}
