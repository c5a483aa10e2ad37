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
    val meta = MetaCodec.encode(e.metadata)
    MetaCodec.writeVarint(out, (1L << 3) | 2)
    MetaCodec.writeVarint(out, meta.length.toLong)
    out.write(meta)
    MetaCodec.writeVarint(out, (2L << 3) | 2)
    MetaCodec.writeVarint(out, e.serializedTask.length.toLong)
    out.write(e.serializedTask)
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Envelope = {
    var meta: TaskMetadata = TaskMetadata()
    var task: Array[Byte] = Array.emptyByteArray
    var p = 0
    while (p < bytes.length) {
      val (key, p1) = MetaCodec.readVarint(bytes, p)
      val field = (key >>> 3).toInt
      (key & 0x7).toInt match {
        case 2 =>
          val (len, p2) = MetaCodec.readVarint(bytes, p1)
          // check the Long length before narrowing (wrap-around safety)
          if (len < 0 || len > bytes.length - p2)
            throw new IllegalArgumentException("truncated field")
          val end = p2 + len.toInt
          field match {
            case 1 => meta = MetaCodec.decode(java.util.Arrays.copyOfRange(bytes, p2, end))
            case 2 => task = java.util.Arrays.copyOfRange(bytes, p2, end)
            case _ => // unknown
          }
          p = end
        case 0 => p = MetaCodec.readVarint(bytes, p1)._2
        case 1 =>
          if (p1 + 8 > bytes.length) throw new IllegalArgumentException("truncated fixed64")
          p = p1 + 8
        case 5 =>
          if (p1 + 4 > bytes.length) throw new IllegalArgumentException("truncated fixed32")
          p = p1 + 4
        case w => throw new IllegalArgumentException(s"unsupported wire type $w")
      }
    }
    Envelope(meta, task)
  }

  /** Migration-tolerant extraction (`ProtocolMigrationTest.java` analog):
    * header metadata wins when present; otherwise try the legacy envelope;
    * a bare payload without either is passed through with empty metadata.
    *
    * Inherent ambiguity (same as the reference's fallback, and why it is a
    * MIGRATION setting to disable once the fleet is upgraded): a bare
    * payload that happens to parse as a valid envelope — e.g. one starting
    * `0x12 <len>` with exactly `len` bytes after, a case MetaCodecFuzzSpec
    * actually hits on random bytes — is indistinguishable from a real
    * envelope on the wire and is taken as one. No stronger heuristic is
    * possible without diverging from the reference's accept set.
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
          // ANY parse failure means "not an envelope" — the fallback contract
          // is pass-through, so don't let an exotic exception from arbitrary
          // bytes escape and kill the extractor
          case scala.util.control.NonFatal(_) => (TaskMetadata(), value)
        }
    }
}
