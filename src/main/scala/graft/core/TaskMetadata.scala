package graft.core

import org.apache.spark.sql.types._

/** Engine-defined task metadata, the one fixed schema of the reference
  * (mirrors `protocol/src/main/proto/decaton.proto:9-22` TaskMetadataProto and
  * its Java mirror `processor/.../TaskMetadata.java:33-61`).
  *
  * Carried on the wire as protobuf in the `dt_meta` record header
  * (`client/.../internal/TaskMetadataUtil.java:28-40`); see [[MetaCodec]].
  */
final case class TaskMetadata(
    timestampMillis: Long = 0L,
    sourceApplicationId: String = "",
    sourceInstanceId: String = "",
    retryCount: Long = 0L,
    scheduledTimeMillis: Long = 0L)

object TaskMetadata {
  /** Column layout of the metadata struct; field order is part of the contract
    * (encode expression reads positionally).
    */
  val schema: StructType = StructType(Seq(
    StructField("timestamp_millis", LongType, nullable = false),
    StructField("source_application_id", StringType, nullable = true),
    StructField("source_instance_id", StringType, nullable = true),
    StructField("retry_count", LongType, nullable = false),
    StructField("scheduled_time_millis", LongType, nullable = false)))

  /** Header key used by the reference for metadata
    * (`client/.../internal/TaskMetadataUtil.java:26`).
    */
  val HeaderKey = "dt_meta"
}

/** Raw input record, the unit of data of the reference — one Kafka record
  * (`processor/.../runtime/ConsumedRecord.java:31-55`). Matches the column
  * set of Spark's Kafka source so streaming and batch-surrogate paths share
  * one schema.
  */
final case class ConsumedRecord(
    topic: String,
    partition: Int,
    offset: Long,
    timestampMillis: Long,
    key: Array[Byte],
    value: Array[Byte],
    headers: Map[String, Array[Byte]] = Map.empty)

/** Extracted task: metadata + typed payload
  * (`processor/.../runtime/DecatonTask.java:32-70`).
  */
final case class Task[T](metadata: TaskMetadata, key: Array[Byte], value: T)

/** Pluggable record → task extraction, the reference's escape hatch for
  * arbitrary wire formats (`processor/.../runtime/TaskExtractor.java:23-31`).
  * Prefer the declarative column-level path (`graft.functions.dt_meta_decode`)
  * when the payload is decodable by Catalyst expressions; this SPI is for the
  * genuinely imperative cases and runs inside `mapPartitions`.
  */
trait TaskExtractor[T] extends Serializable {
  def extract(record: ConsumedRecord): Task[T]
}
