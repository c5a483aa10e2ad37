package graft.core

import java.io.ByteArrayOutputStream

/** Pre-9.0 value-envelope wire format: instead of a `dt_meta` header, the
  * record VALUE is a protobuf `DecatonTaskRequest{ metadata = 1,
  * serialized_task = 2 }` (reference
  * `protocol/src/main/proto/decaton_internal.proto:13-18`). The consumer's
  * fallback parse path (`DefaultTaskExtractor.java:48-77`, gated by
  * `CONFIG_LEGACY_PARSE_FALLBACK_ENABLED`, `ProcessorProperties.java:253-255`)
  * accepts both formats during migration — mirrored by [[decodeEither]].
  */
object LegacyEnvelope {

  final case class Envelope(metadata: TaskMetadata, serializedTask: Array[Byte])

  def encode(e: Envelope): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    def varint(v: Long): Unit = {
      var x = v
      while ((x & ~0x7fL) != 0L) { out.write(((x & 0x7f) | 0x80).toInt); x >>>= 7 }
      out.write(x.toInt & 0x7f)
    }
    val meta = MetaCodec.encode(e.metadata)
    varint((1L << 3) | 2); varint(meta.length.toLong); out.write(meta)
    varint((2L << 3) | 2); varint(e.serializedTask.length.toLong); out.write(e.serializedTask)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Envelope = {
    var meta: TaskMetadata = TaskMetadata()
    var task: Array[Byte] = Array.emptyByteArray
    var p = 0
    def varint(): Long = {
      var result = 0L; var shift = 0
      while (true) {
        if (p >= bytes.length) throw new IllegalArgumentException("truncated varint")
        val b = bytes(p); p += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
        if (shift >= 64) throw new IllegalArgumentException("varint too long")
      }
      0L
    }
    while (p < bytes.length) {
      val key = varint()
      val field = (key >>> 3).toInt
      (key & 0x7).toInt match {
        case 2 =>
          val len = varint().toInt
          if (len < 0 || p + len > bytes.length) throw new IllegalArgumentException("truncated field")
          field match {
            case 1 => meta = MetaCodec.decode(java.util.Arrays.copyOfRange(bytes, p, p + len))
            case 2 => task = java.util.Arrays.copyOfRange(bytes, p, p + len)
            case _ => // unknown
          }
          p += len
        case 0 => varint()
        case 1 => p += 8
        case 5 => p += 4
        case w => throw new IllegalArgumentException(s"unsupported wire type $w")
      }
    }
    Envelope(meta, task)
  }

  /** Migration-tolerant extraction (`ProtocolMigrationTest.java` analog):
    * header metadata wins when present; otherwise try the legacy envelope;
    * a bare payload without either is passed through with empty metadata.
    */
  def decodeEither(headerMeta: Option[Array[Byte]], value: Array[Byte]): (TaskMetadata, Array[Byte]) =
    headerMeta match {
      case Some(h) => (MetaCodec.decode(h), value)
      case None =>
        try {
          val e = decode(value)
          if (e.serializedTask.nonEmpty) (e.metadata, e.serializedTask)
          else (TaskMetadata(), value)
        } catch {
          case _: IllegalArgumentException => (TaskMetadata(), value)
        }
    }
}
