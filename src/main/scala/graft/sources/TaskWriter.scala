package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{dt_meta_encode, key_bytes}
import graft.operators.Retry

/** S3 — the producer surface (`DecatonClient.put`, `DecatonClient.java:41-93`;
  * metadata header write `TaskMetadataUtil.java:28-40`).
  *
  * Shapes a DataFrame into the Kafka-sink schema — `key BINARY, value BINARY,
  * headers ARRAY<STRUCT<key STRING, value BINARY>>, topic STRING` — with the
  * task metadata protobuf-encoded into the `dt_meta` header exactly as the
  * reference's client writes it. `df.write.format("kafka")` (or writeStream)
  * consumes this shape directly; partition routing by key is the Kafka
  * producer's default partitioner, same ordering contract as the reference.
  */
object TaskWriter {

  /** Build the sink-ready frame. `metaCol` must be a struct in
    * TaskMetadata.schema field order (see [[graft.core.TaskMetadata]]).
    */
  def toKafkaShape(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      metaCol: Column,
      topic: String): DataFrame =
    df.select(
      key_bytes(keyCol).as("key"),
      valueCol.cast("binary").as("value"),
      array(struct(
        lit(graft.core.TaskMetadata.HeaderKey).as("key"),
        dt_meta_encode(metaCol).as("value"))).as("headers"),
      lit(topic).as("topic"))

  /** Retry-topic producer shape (S4): metadata advanced by retry_count+1 and
    * backoff before encoding (`DecatonTaskRetryQueueingProcessor.java:60-112`).
    *
    * `legacyFormat` is the `decaton.retry.task.in.legacy.format` toggle
    * ([[graft.config.EngineProperties.RetryTaskInLegacyFormat]];
    * `DecatonTaskRetryQueueingProcessor.java:73-92`): when true the advanced
    * metadata rides INSIDE the pre-9.0 value envelope and the `dt_meta`
    * header is omitted — the reference removes it explicitly, because a
    * consumer running legacy-parse fallback dispatches on header presence
    * and an inconsistent pair fails extraction. Resolve the property per
    * batch (foreachBatch) for trigger-boundary hot reload.
    */
  def toRetryShape(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      metaCol: Column,
      originTopic: String,
      nowMillis: Column,
      backoffMillis: Column,
      legacyFormat: Boolean = false): DataFrame =
    if (legacyFormat) {
      val advanced = Retry.advanceRetry(metaCol, nowMillis, backoffMillis)
      df.select(
        key_bytes(keyCol).as("key"),
        graft.functions.legacy_envelope_encode(advanced, valueCol.cast("binary"))
          .as("value"),
        array().cast("array<struct<key:string,value:binary>>").as("headers"),
        lit(Retry.retryTopic(originTopic)).as("topic"))
    } else toKafkaShape(
      df.withColumn("__meta_retry", Retry.advanceRetry(metaCol, nowMillis, backoffMillis)),
      keyCol, valueCol, col("__meta_retry"), Retry.retryTopic(originTopic))

  /** Idempotence marker (EXTENSION — the reference's producer is plain
    * at-least-once, `DecatonTaskRetryQueueingProcessor.java:60-112`; this is
    * the Kafka-idempotent-producer idea re-expressed as data): stamp each
    * record with a `(producer id, sequence)` header pair before producing.
    * A produce retried after an uncertain failure re-lands the SAME
    * sequences, so the reader side ([[GraftConsumers.dedupeByMarker]])
    * collapses duplicates within its watermark horizon and the
    * produce→consume hop becomes effectively-once. `seqCol` must be unique
    * and stable per logical record within the producer id (a batch id ×
    * row id composite, a source offset, a content hash — NOT a timestamp
    * taken at produce time, which changes on retry).
    */
  val PidHeader = "graft_pid"
  val SeqHeader = "graft_seq"

  def withIdempotenceMarker(
      kafkaShaped: DataFrame,
      producerId: String,
      seqCol: Column): DataFrame =
    kafkaShaped.withColumn("headers",
      concat(col("headers"), array(
        struct(lit(PidHeader).as("key"), lit(producerId).cast("binary").as("value")),
        struct(lit(SeqHeader).as("key"),
          seqCol.cast("string").cast("binary").as("value")))))
}

/** Consumer-side helpers for the producer extensions. */
object GraftConsumers {

  /** Effectively-once consumption over at-least-once production: drop
    * records whose `(producer id, sequence)` marker was already delivered
    * within the watermark horizon. Records WITHOUT a marker pass through
    * untouched — their dedup key falls back to the record's own
    * (topic, partition, offset), which is unique by construction, so
    * unmarked traffic is never collapsed. State is watermark-bounded
    * (`dropDuplicatesWithinWatermark`), the 100 TB-safe shape.
    */
  def dedupeByMarker(stream: DataFrame, watermarkDelay: String): DataFrame = {
    // last-wins header lookup on the ARRAY (Kafka's lastHeader convention);
    // a map projection would throw on any repeated header key, and a plain
    // element_at(-1) throws on the empty filter result of an unmarked record
    def header(name: String): Column =
      try_element_at(filter(col("headers"),
        h => h.getField("key") === lit(name)), lit(-1)).getField("value")
    stream
      .withColumn("__dedup_pid",
        coalesce(header(TaskWriter.PidHeader).cast("string"),
          concat_ws(":", col("topic"), col("partition"))))
      .withColumn("__dedup_seq",
        coalesce(header(TaskWriter.SeqHeader).cast("string"),
          col("offset").cast("string")))
      .withWatermark("timestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark("__dedup_pid", "__dedup_seq")
      .drop("__dedup_pid", "__dedup_seq")
  }
}
