package graft

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{ProtoCodec, ProtoField, ProtoSchema, ProtoType}

/** Wire-level vectors are checked against the public protobuf encoding spec
  * (protobuf.dev/programming-guides/encoding) — same posture as
  * MetaCodecSpec.
  */
class ProtoCodecSpec extends SparkTestBase {

  private val flat = ProtoSchema(Seq(
    ProtoField(1, "uid", ProtoType.Int64),
    ProtoField(2, "name", ProtoType.PString),
    ProtoField(3, "score", ProtoType.PDouble),
    ProtoField(4, "tags", ProtoType.Int64, repeated = true)))

  test("encode matches hand-computed wire bytes") {
    val row = new GenericInternalRow(Array[Any](
      150L, UTF8String.fromString("ab"), null, null))
    // field 1 varint 150: tag 0x08, bytes 0x96 0x01; field 2 len-2 "ab":
    // tag 0x12, len 0x02, 0x61 0x62 (spec's canonical 150 example)
    val expected = Array(0x08, 0x96, 0x01, 0x12, 0x02, 0x61, 0x62).map(_.toByte)
    assert(ProtoCodec.encode(flat, row).toSeq == expected.toSeq)
  }

  test("decode of unpacked and packed repeated varints agree") {
    // unpacked: two `tag 0x20` varints; packed: tag 0x22 (len-delimited)
    val unpacked = Array(0x20, 0x03, 0x20, 0x8E, 0x02).map(_.toByte)
    val packed = Array(0x22, 0x03, 0x03, 0x8E, 0x02).map(_.toByte)
    val a = ProtoCodec.decode(flat, unpacked).getArray(3)
    val b = ProtoCodec.decode(flat, packed).getArray(3)
    assert(a.toLongArray().toSeq == Seq(3L, 270L))
    assert(b.toLongArray().toSeq == Seq(3L, 270L))
  }

  test("packed repeated FIXED scalars decode (proto3 packs doubles/floats by default)") {
    val dSchema = ProtoSchema(Seq(ProtoField(1, "ds", ProtoType.PDouble, repeated = true)))
    val fSchema = ProtoSchema(Seq(ProtoField(1, "fs", ProtoType.PFloat, repeated = true)))
    def le64(v: Double): Seq[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
    }
    def le32(v: Float): Seq[Byte] = {
      val bits = java.lang.Float.floatToIntBits(v)
      (0 until 4).map(i => ((bits >>> (8 * i)) & 0xff).toByte)
    }
    // field 1, wire 2 (packed): tag 0x0A, length, little-endian payloads
    val packedD = (Seq(0x0A.toByte, 16.toByte) ++ le64(1.5) ++ le64(-2.25)).toArray
    val ds = ProtoCodec.decode(dSchema, packedD).getArray(0).toDoubleArray().toSeq
    assert(ds == Seq(1.5, -2.25))
    val packedF = (Seq(0x0A.toByte, 8.toByte) ++ le32(3.5f) ++ le32(-0.5f)).toArray
    val fs = ProtoCodec.decode(fSchema, packedF).getArray(0).toFloatArray().toSeq
    assert(fs == Seq(3.5f, -0.5f))
    // unpacked form still accepted (wire 1 / wire 5 per element)
    val unpackedD = (Seq(0x09.toByte) ++ le64(1.5) ++ Seq(0x09.toByte) ++ le64(-2.25)).toArray
    assert(ProtoCodec.decode(dSchema, unpackedD).getArray(0).toDoubleArray().toSeq ==
      Seq(1.5, -2.25))
    // a torn packed run (length not a multiple of the element width) throws
    val torn = (Seq(0x0A.toByte, 12.toByte) ++ le64(1.5) ++ le32(1.0f)).toArray
    intercept[IllegalArgumentException](ProtoCodec.decode(dSchema, torn))
  }

  test("roundtrip identity for all field types incl. nested message") {
    val nested = ProtoSchema(Seq(
      ProtoField(1, "x", ProtoType.Int32),
      ProtoField(2, "ok", ProtoType.Bool)))
    val schema = ProtoSchema(Seq(
      ProtoField(1, "uid", ProtoType.Int64),
      ProtoField(2, "name", ProtoType.PString),
      ProtoField(3, "score", ProtoType.PDouble),
      ProtoField(4, "ratio", ProtoType.PFloat),
      ProtoField(5, "blob", ProtoType.PBytes),
      ProtoField(6, "inner", ProtoType.Message(nested)),
      ProtoField(7, "tags", ProtoType.Int64, repeated = true)))
    val innerRow = new GenericInternalRow(Array[Any](42, true))
    val row = new GenericInternalRow(Array[Any](
      -1L, UTF8String.fromString("héllo"), 3.5d, 0.25f,
      Array[Byte](1, 2, 3), innerRow,
      new GenericArrayData(Array[Any](0L, 7L, 1L << 40))))
    val back = ProtoCodec.decode(schema, ProtoCodec.encode(schema, row))
    assert(back.getLong(0) == -1L)
    assert(back.getUTF8String(1).toString == "héllo")
    assert(back.getDouble(2) == 3.5d)
    assert(back.getFloat(3) == 0.25f)
    assert(back.getBinary(4).toSeq == Seq[Byte](1, 2, 3))
    val inner = back.getStruct(5, 2)
    assert(inner.getInt(0) == 42 && inner.getBoolean(1))
    assert(back.getArray(6).toLongArray().toSeq == Seq(0L, 7L, 1L << 40))
  }

  test("null fields are omitted on the wire and come back null") {
    val row = new GenericInternalRow(Array[Any](null, null, 1.5d, null))
    val bytes = ProtoCodec.encode(flat, row)
    assert(bytes.length == 9) // only tag + fixed64
    val back = ProtoCodec.decode(flat, bytes)
    assert(back.isNullAt(0) && back.isNullAt(1) && !back.isNullAt(2) && back.isNullAt(3))
  }

  test("unknown fields are skipped (forward compat)") {
    // field 9 varint + field 10 len-delimited + field 1 known
    val bytes = Array(0x48, 0x05, 0x52, 0x02, 0xAA, 0xBB, 0x08, 0x07).map(_.toByte)
    val back = ProtoCodec.decode(flat, bytes)
    assert(back.getLong(0) == 7L)
  }

  test("truncated input throws (and the expression maps it to null)") {
    intercept[IllegalArgumentException] {
      ProtoCodec.decode(flat, Array(0x12, 0x05, 0x61).map(_.toByte)) // len 5, 1 byte left
    }
    import org.apache.spark.sql.functions._
    import graft.functions.proto_decode
    val df = spark.range(1).select(lit(Array(0x12, 0x05, 0x61).map(_.toByte)).as("b"))
    assert(df.select(proto_decode(col("b"), flat)).head().isNullAt(0))
  }

  test("a varint crossing its region boundary throws instead of decoding garbage") {
    // packed run for field 4 declared 1 byte long, but that byte has the
    // continuation bit set — the varint would spill into the next field
    intercept[IllegalArgumentException] {
      ProtoCodec.decode(flat, Array(0x22, 0x01, 0x80, 0x08, 0x07).map(_.toByte))
    }
    // nested region ending mid-varint: message field (declared as sub-schema)
    val withNested = ProtoSchema(Seq(
      ProtoField(1, "inner", ProtoType.Message(ProtoSchema(Seq(
        ProtoField(1, "x", ProtoType.Int64)))))))
    intercept[IllegalArgumentException] {
      ProtoCodec.decode(withNested, Array(0x0A, 0x02, 0x08, 0x80).map(_.toByte))
    }
  }

  test("wire/declared type mismatch on a KNOWN field is rejected, not misread") {
    // field 1 declared Int64 but sent len-delimited
    intercept[IllegalArgumentException] {
      ProtoCodec.decode(flat, Array(0x0A, 0x01, 0x61).map(_.toByte))
    }
  }
}
