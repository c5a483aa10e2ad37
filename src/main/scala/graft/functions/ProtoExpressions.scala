package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.core.{ProtoCodec, ProtoSchema}

/** Column surface of the descriptor-driven payload codec
  * ([[graft.core.ProtoCodec]]) — the engine's analog of the reference's
  * generic `ProtocolBuffersDeserializer`: any user message shape decodes by
  * descriptor, no per-type TaskExtractor. CodegenFallback like the dt_meta
  * expressions: one eval per record at the extraction boundary.
  */

/** `proto_decode(bytes)` → struct per the descriptor; null on malformed
  * input (poison records flow to the discard side, E2 — same contract as
  * `dt_meta_decode`).
  */
case class ProtoDecode(child: Expression, schema: ProtoSchema)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = schema.sparkSchema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    try ProtoCodec.decode(schema, input.asInstanceOf[Array[Byte]])
    catch { case _: IllegalArgumentException => null }

  override def prettyName: String = "proto_decode"
  override protected def withNewChildInternal(newChild: Expression): ProtoDecode =
    copy(child = newChild)
}

/** `proto_encode(struct)` → wire bytes per the descriptor. The input struct
  * must be laid out as `schema.sparkSchema` (null fields are omitted from
  * the wire, so decode∘encode is the identity field-for-field).
  */
case class ProtoEncode(child: Expression, schema: ProtoSchema)
    extends UnaryExpression with CodegenFallback with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    ProtoCodec.encode(schema, input.asInstanceOf[InternalRow])

  override def prettyName: String = "proto_encode"
  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}
