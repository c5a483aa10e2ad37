package graft.core

import java.io.ByteArrayOutputStream

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Descriptor-driven protobuf wire codec for arbitrary user payloads — the
  * generic half of the reference's payload deserialization
  * (`protobuf/src/main/java/.../ProtocolBuffersDeserializer.java`, which
  * accepts any generated `Message` parser). Here the "descriptor" is a
  * [[ProtoSchema]] value instead of generated code: typed pipelines decode
  * any message shape by declaring (field number, name, type) triples — no
  * hand-written TaskExtractor per message type, and no protobuf-java
  * dependency (the container has none; built against the public wire spec,
  * protobuf.dev/programming-guides/encoding, like [[MetaCodec]]).
  *
  * Supported: varint scalars (int64/int32/bool), fixed64 double, fixed32
  * float, length-delimited string/bytes, nested messages, and repeated
  * fields (decode accepts both packed and unpacked forms for varints AND
  * fixed scalars — proto3 writers pack all repeated scalars by default).
  * Unknown fields are skipped, matching protobuf's forward-compat
  * guarantee. Missing fields decode as null (so a field explicitly written
  * as 0 is distinguishable from an absent one).
  */
sealed trait ProtoType
object ProtoType {
  case object Int64 extends ProtoType
  case object Int32 extends ProtoType
  case object Bool extends ProtoType
  case object PDouble extends ProtoType
  case object PFloat extends ProtoType
  case object PString extends ProtoType
  case object PBytes extends ProtoType
  final case class Message(schema: ProtoSchema) extends ProtoType
}

final case class ProtoField(
    number: Int,
    name: String,
    ptype: ProtoType,
    repeated: Boolean = false)

final case class ProtoSchema(fields: Seq[ProtoField]) {
  require(fields.map(_.number).distinct.size == fields.size, "duplicate field numbers")
  require(fields.map(_.name).distinct.size == fields.size, "duplicate field names")

  def sparkType(f: ProtoField): DataType = {
    val base: DataType = f.ptype match {
      case ProtoType.Int64      => LongType
      case ProtoType.Int32      => IntegerType
      case ProtoType.Bool       => BooleanType
      case ProtoType.PDouble    => DoubleType
      case ProtoType.PFloat     => FloatType
      case ProtoType.PString    => StringType
      case ProtoType.PBytes     => BinaryType
      case ProtoType.Message(s) => s.sparkSchema
    }
    if (f.repeated) ArrayType(base, containsNull = false) else base
  }

  lazy val sparkSchema: StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f), nullable = true)))

  /** Field-number dispatch table, built once per schema (NOT per record —
    * decode runs once per row, and nested/repeated messages once per
    * occurrence; rebuilding this map there would dominate decode cost).
    */
  lazy val byNumber: Map[Int, (ProtoField, Int)] =
    fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
}

object ProtoCodec {
  import MetaCodec.writeVarint

  /** Varint read bounded by the enclosing region: a varint whose bytes
    * cross `end` (a packed run or nested message ending mid-varint) is
    * malformed input and must throw — falling through to the array bound
    * would decode garbage AND re-parse the overrun bytes as the next field.
    */
  private def readVarint(bytes: Array[Byte], pos: Int, end: Int): (Long, Int) = {
    val r = MetaCodec.readVarint(bytes, pos)
    if (r._2 > end) throw new IllegalArgumentException("varint crosses region boundary")
    r
  }

  // -- decode ---------------------------------------------------------------

  /** Decode `bytes` per `schema` into an InternalRow (null for absent
    * fields); throws IllegalArgumentException on malformed input.
    */
  def decode(schema: ProtoSchema, bytes: Array[Byte]): InternalRow =
    decodeRange(schema, bytes, 0, bytes.length)

  private def decodeRange(schema: ProtoSchema, bytes: Array[Byte], start: Int, end: Int): InternalRow = {
    val byNumber = schema.byNumber
    val values = new Array[Any](schema.fields.size)
    val repeats = new Array[ArrayBuffer[Any]](schema.fields.size)
    var p = start
    while (p < end) {
      val (key, p1) = readVarint(bytes, p, end)
      val fieldNo = (key >>> 3).toInt
      val wire = (key & 0x7).toInt
      byNumber.get(fieldNo) match {
        case Some((f, idx)) =>
          p = readKnown(f, idx, wire, bytes, p1, end, values, repeats)
        case None =>
          p = skipField(wire, bytes, p1, end)
      }
    }
    var i = 0
    while (i < values.length) {
      if (repeats(i) != null) values(i) = new GenericArrayData(repeats(i).toArray)
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def readKnown(
      f: ProtoField, idx: Int, wire: Int, bytes: Array[Byte], p1: Int, end: Int,
      values: Array[Any], repeats: Array[ArrayBuffer[Any]]): Int = {

    def put(v: Any): Unit =
      if (f.repeated) {
        if (repeats(idx) == null) repeats(idx) = new ArrayBuffer[Any]
        repeats(idx) += v
      } else values(idx) = v

    def varintValue(raw: Long): Any = f.ptype match {
      case ProtoType.Int64 => raw
      case ProtoType.Int32 => raw.toInt
      case ProtoType.Bool  => raw != 0L
      case t => throw new IllegalArgumentException(s"field ${f.name}: varint wire for $t")
    }

    (wire, f.ptype) match {
      case (0, ProtoType.Int64 | ProtoType.Int32 | ProtoType.Bool) =>
        val (raw, p2) = readVarint(bytes, p1, end)
        put(varintValue(raw)); p2
      case (1, ProtoType.PDouble) =>
        require(p1 + 8 <= end, "truncated fixed64")
        put(java.lang.Double.longBitsToDouble(readFixed64(bytes, p1))); p1 + 8
      case (5, ProtoType.PFloat) =>
        require(p1 + 4 <= end, "truncated fixed32")
        put(java.lang.Float.intBitsToFloat(readFixed32(bytes, p1))); p1 + 4
      case (2, _) =>
        val (len, p2) = readVarint(bytes, p1, end)
        if (len < 0 || len > end - p2) throw new IllegalArgumentException("truncated bytes field")
        val stop = p2 + len.toInt
        f.ptype match {
          case ProtoType.PString =>
            put(UTF8String.fromBytes(bytes, p2, len.toInt))
          case ProtoType.PBytes =>
            put(java.util.Arrays.copyOfRange(bytes, p2, stop))
          case ProtoType.Message(sub) =>
            put(decodeRange(sub, bytes, p2, stop))
          case ProtoType.Int64 | ProtoType.Int32 | ProtoType.Bool if f.repeated =>
            // packed repeated varints (proto3 default encoding)
            var q = p2
            while (q < stop) {
              val (raw, q2) = readVarint(bytes, q, stop)
              put(varintValue(raw)); q = q2
            }
          case ProtoType.PDouble if f.repeated =>
            // packed repeated fixed64 — proto3 packs ALL repeated scalars
            // by default, not just varints; a region not a multiple of 8 is
            // torn input, never a silent partial decode
            if ((stop - p2) % 8 != 0)
              throw new IllegalArgumentException(
                s"field ${f.name}: packed fixed64 run of ${stop - p2} bytes")
            var q = p2
            while (q < stop) {
              put(java.lang.Double.longBitsToDouble(readFixed64(bytes, q))); q += 8
            }
          case ProtoType.PFloat if f.repeated =>
            if ((stop - p2) % 4 != 0)
              throw new IllegalArgumentException(
                s"field ${f.name}: packed fixed32 run of ${stop - p2} bytes")
            var q = p2
            while (q < stop) {
              put(java.lang.Float.intBitsToFloat(readFixed32(bytes, q))); q += 4
            }
          case t => throw new IllegalArgumentException(s"field ${f.name}: length-delimited wire for $t")
        }
        stop
      case _ =>
        throw new IllegalArgumentException(
          s"field ${f.name}: wire type $wire does not match ${f.ptype}")
    }
  }

  private def skipField(wire: Int, bytes: Array[Byte], p1: Int, end: Int): Int = wire match {
    case 0 => readVarint(bytes, p1, end)._2
    case 1 => require(p1 + 8 <= end, "truncated fixed64"); p1 + 8
    case 2 =>
      val (len, p2) = readVarint(bytes, p1, end)
      if (len < 0 || len > end - p2) throw new IllegalArgumentException("truncated bytes field")
      p2 + len.toInt
    case 5 => require(p1 + 4 <= end, "truncated fixed32"); p1 + 4
    case w => throw new IllegalArgumentException(s"unsupported wire type $w")
  }

  private def readFixed64(b: Array[Byte], p: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(p + i) & 0xffL) << (8 * i); i += 1 }
    v
  }
  private def readFixed32(b: Array[Byte], p: Int): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v |= (b(p + i) & 0xff) << (8 * i); i += 1 }
    v
  }

  // -- encode ---------------------------------------------------------------

  /** Encode an InternalRow (laid out as `schema.sparkSchema`) to wire bytes.
    * Null fields are omitted; non-null zeros are written explicitly, so
    * decode(encode(x)) == x field-for-field.
    */
  def encode(schema: ProtoSchema, row: InternalRow): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeMessage(schema, row, out)
    out.toByteArray
  }

  private def writeMessage(schema: ProtoSchema, row: InternalRow, out: ByteArrayOutputStream): Unit = {
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        if (f.repeated) {
          val arr = row.getArray(i)
          var j = 0
          while (j < arr.numElements()) {
            writeScalar(f, elementAt(f, arr, j), out)
            j += 1
          }
        } else writeScalar(f, valueAt(f, row, i), out)
      }
    }
  }

  private def valueAt(f: ProtoField, row: InternalRow, i: Int): Any = f.ptype match {
    case ProtoType.Int64      => row.getLong(i)
    case ProtoType.Int32      => row.getInt(i)
    case ProtoType.Bool       => row.getBoolean(i)
    case ProtoType.PDouble    => row.getDouble(i)
    case ProtoType.PFloat     => row.getFloat(i)
    case ProtoType.PString    => row.getUTF8String(i)
    case ProtoType.PBytes     => row.getBinary(i)
    case ProtoType.Message(s) => row.getStruct(i, s.fields.size)
  }

  private def elementAt(f: ProtoField, arr: ArrayData, j: Int): Any = f.ptype match {
    case ProtoType.Int64      => arr.getLong(j)
    case ProtoType.Int32      => arr.getInt(j)
    case ProtoType.Bool       => arr.getBoolean(j)
    case ProtoType.PDouble    => arr.getDouble(j)
    case ProtoType.PFloat     => arr.getFloat(j)
    case ProtoType.PString    => arr.getUTF8String(j)
    case ProtoType.PBytes     => arr.getBinary(j)
    case ProtoType.Message(s) => arr.getStruct(j, s.fields.size)
  }

  private def writeScalar(f: ProtoField, v: Any, out: ByteArrayOutputStream): Unit = {
    def tag(wire: Int): Unit = writeVarint(out, (f.number.toLong << 3) | wire)
    f.ptype match {
      case ProtoType.Int64 => tag(0); writeVarint(out, v.asInstanceOf[Long])
      case ProtoType.Int32 => tag(0); writeVarint(out, v.asInstanceOf[Int].toLong)
      case ProtoType.Bool  => tag(0); writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case ProtoType.PDouble =>
        tag(1); writeFixed64(out, java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case ProtoType.PFloat =>
        tag(5); writeFixed32(out, java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case ProtoType.PString =>
        val b = v.asInstanceOf[UTF8String].getBytes
        tag(2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case ProtoType.PBytes =>
        val b = v.asInstanceOf[Array[Byte]]
        tag(2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case ProtoType.Message(s) =>
        val sub = new ByteArrayOutputStream(32)
        writeMessage(s, v.asInstanceOf[InternalRow], sub)
        val b = sub.toByteArray
        tag(2); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
    }
  }

  private def writeFixed64(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def writeFixed32(out: ByteArrayOutputStream, v: Int): Unit = {
    var i = 0
    while (i < 4) { out.write((v >>> (8 * i)) & 0xff); i += 1 }
  }
}
