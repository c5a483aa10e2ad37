package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{MetaCodec, TaskMetadata}

/** Decode the `dt_meta` header bytes (protobuf TaskMetadataProto,
  * reference `protocol/src/main/proto/decaton.proto:9-22`) into a metadata
  * struct. Null/invalid input decodes to null — the reference's
  * drop-not-fail policy for poison records (`ProcessPipeline.java:79-91`).
  *
  * CodegenFallback is acceptable: this runs once per record at the extraction
  * boundary, not inside hot aggregation loops.
  */
case class DtMetaDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TaskMetadata.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val m = MetaCodec.decode(bytes)
      InternalRow(
        m.timestampMillis,
        UTF8String.fromString(m.sourceApplicationId),
        UTF8String.fromString(m.sourceInstanceId),
        m.retryCount,
        m.scheduledTimeMillis)
    } catch {
      case _: IllegalArgumentException => null
    }
  }

  override def prettyName: String = "dt_meta_decode"
  override protected def withNewChildInternal(c: Expression): DtMetaDecode = copy(child = c)
}

/** Encode a metadata struct (positional fields per [[TaskMetadata.schema]])
  * into `dt_meta` header bytes, wire-compatible with the reference's producer
  * (`client/.../internal/TaskMetadataUtil.java:28-40`).
  */
case class DtMetaEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    def str(i: Int): String = {
      val s = row.getUTF8String(i)
      if (s == null) "" else s.toString
    }
    MetaCodec.encode(TaskMetadata(
      timestampMillis = row.getLong(0),
      sourceApplicationId = str(1),
      sourceInstanceId = str(2),
      retryCount = row.getLong(3),
      scheduledTimeMillis = row.getLong(4)))
  }

  override def prettyName: String = "dt_meta_encode"
  override protected def withNewChildInternal(c: Expression): DtMetaEncode = copy(child = c)
}

/** Decode a pre-9.0 legacy value envelope (`decaton_internal.proto:13-18`)
  * into `struct<meta: TaskMetadata.schema, task: binary>`; null on malformed
  * input (drop-not-fail, `DefaultTaskExtractor.java:48-77`).
  */
case class LegacyEnvelopeDecode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("meta", TaskMetadata.schema, nullable = false),
    StructField("task", BinaryType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    try {
      val e = graft.core.LegacyEnvelope.decode(input.asInstanceOf[Array[Byte]])
      val m = e.metadata
      InternalRow(
        InternalRow(m.timestampMillis, UTF8String.fromString(m.sourceApplicationId),
          UTF8String.fromString(m.sourceInstanceId), m.retryCount, m.scheduledTimeMillis),
        e.serializedTask)
    } catch {
      case _: IllegalArgumentException => null
    }
  }

  override def prettyName: String = "legacy_envelope_decode"
  override protected def withNewChildInternal(c: Expression): LegacyEnvelopeDecode = copy(child = c)
}

/** Encode (metadata struct, task bytes) into the legacy value envelope. */
case class LegacyEnvelopeEncode(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(meta: Any, task: Any): Any = {
    val row = meta.asInstanceOf[InternalRow]
    def str(i: Int): String = {
      val s = row.getUTF8String(i); if (s == null) "" else s.toString
    }
    graft.core.LegacyEnvelope.encode(graft.core.LegacyEnvelope.Envelope(
      TaskMetadata(row.getLong(0), str(1), str(2), row.getLong(3), row.getLong(4)),
      task.asInstanceOf[Array[Byte]]))
  }

  override def prettyName: String = "legacy_envelope_encode"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): LegacyEnvelopeEncode =
    copy(left = l, right = r)
}
