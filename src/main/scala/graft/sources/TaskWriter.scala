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
    */
  def toRetryShape(
      df: DataFrame,
      keyCol: Column,
      valueCol: Column,
      metaCol: Column,
      originTopic: String,
      nowMillis: Column,
      backoffMillis: Column): DataFrame =
    toKafkaShape(
      df.withColumn("__meta_retry", Retry.advanceRetry(metaCol, nowMillis, backoffMillis)),
      keyCol, valueCol, col("__meta_retry"), Retry.retryTopic(originTopic))
}
