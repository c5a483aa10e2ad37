package graft.core

import java.io.ByteArrayOutputStream

/** Protobuf wire-format codec for [[TaskMetadata]], compatible with the
  * reference's `TaskMetadataProto` (`protocol/src/main/proto/decaton.proto:9-22`):
  *
  * {{{
  * int64  timestamp_millis      = 1;   // varint
  * string source_application_id = 2;   // len-delimited
  * string source_instance_id    = 3;   // len-delimited
  * int64  retry_count           = 4;   // varint
  * int64  scheduled_time_millis = 5;   // varint
  * }}}
  *
  * Hand-rolled against the public protobuf encoding spec
  * (protobuf.dev/programming-guides/encoding) rather than a protobuf-java
  * dependency: the message is 5 fields and the engine must not grow a wire
  * dependency for one header. Unknown fields are skipped, so messages from
  * newer writers still parse (same guarantee protobuf gives).
  */
object MetaCodec {

  // -- varint primitives ----------------------------------------------------

  private[core] def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7f)
  }

  /** Returns (value, next position); throws on truncated input. */
  private[core] def readVarint(bytes: Array[Byte], pos: Int): (Long, Int) = {
    var result = 0L
    var shift = 0
    var p = pos
    while (true) {
      if (p >= bytes.length) throw new IllegalArgumentException("truncated varint")
      val b = bytes(p)
      result |= (b & 0x7fL) << shift
      p += 1
      if ((b & 0x80) == 0) return (result, p)
      shift += 7
      if (shift >= 64) throw new IllegalArgumentException("varint too long")
    }
    throw new IllegalStateException("unreachable")
  }

  // -- message codec --------------------------------------------------------

  def encode(m: TaskMetadata): Array[Byte] = {
    val out = new ByteArrayOutputStream(48)
    def tag(field: Int, wireType: Int): Unit = writeVarint(out, (field.toLong << 3) | wireType)
    def int64(field: Int, v: Long): Unit =
      if (v != 0L) { tag(field, 0); writeVarint(out, v) }
    def str(field: Int, v: String): Unit =
      if (v != null && v.nonEmpty) {
        val b = v.getBytes("UTF-8")
        tag(field, 2); writeVarint(out, b.length.toLong); out.write(b)
      }
    int64(1, m.timestampMillis)
    str(2, m.sourceApplicationId)
    str(3, m.sourceInstanceId)
    int64(4, m.retryCount)
    int64(5, m.scheduledTimeMillis)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): TaskMetadata = {
    var m = TaskMetadata()
    var p = 0
    while (p < bytes.length) {
      val (key, p1) = readVarint(bytes, p)
      val field = (key >>> 3).toInt
      val wire = (key & 0x7).toInt
      wire match {
        case 0 => // varint
          val (v, p2) = readVarint(bytes, p1)
          field match {
            case 1 => m = m.copy(timestampMillis = v)
            case 4 => m = m.copy(retryCount = v)
            case 5 => m = m.copy(scheduledTimeMillis = v)
            case _ => // unknown varint field: skipped by consuming it
          }
          p = p2
        case 2 => // length-delimited
          val (len, p2) = readVarint(bytes, p1)
          // bounds-check the 64-bit length BEFORE narrowing: a wrapped value
          // like 2^31+5 would otherwise turn into a negative/small int and
          // either throw from String's ctor or silently misparse
          if (len < 0 || len > bytes.length - p2)
            throw new IllegalArgumentException("truncated bytes field")
          val end = p2 + len.toInt
          field match {
            case 2 => m = m.copy(sourceApplicationId = new String(bytes, p2, len.toInt, "UTF-8"))
            case 3 => m = m.copy(sourceInstanceId = new String(bytes, p2, len.toInt, "UTF-8"))
            case _ => // unknown
          }
          p = end
        case 1 => // fixed64: skip, rejecting truncation
          if (p1 + 8 > bytes.length) throw new IllegalArgumentException("truncated fixed64")
          p = p1 + 8
        case 5 => // fixed32: skip, rejecting truncation
          if (p1 + 4 > bytes.length) throw new IllegalArgumentException("truncated fixed32")
          p = p1 + 4
        case _ => throw new IllegalArgumentException(s"unsupported wire type $wire")
      }
    }
    m
  }
}
