package graft.sources.warc

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{BinaryType, StringType}

/** The WRITE side of the `graft-warc` medium — archive-as-you-crawl: each
  * epoch's partition lands as ONE immutable `.warc.gz` segment of
  * per-record gzip members (the Common Crawl shape the READ side tails),
  * via write-to-temp + atomic rename at the driver's job/epoch commit —
  * the `graft-jsonl` sink's effectively-once machinery on the WARC
  * container: segment names are pure functions of (query tag, epoch,
  * partition), so a replayed micro-batch renames over its own previous
  * output, and a batch job's uuid tag means SaveMode.Append always ADDS.
  *
  * Input contract (case-insensitive, exact match preferred):
  *   - `target_uri` string (required) — becomes WARC-Target-URI;
  *   - `content` binary or string (required) — the record block;
  *   - `warc_type` string (optional; default `resource`);
  *   - `warc_date` string (optional; default the epoch instant) — callers
  *     wanting real fetch times pass the column; the default is a CONSTANT
  *     so a replayed epoch re-serializes byte-identically (wall-clock
  *     stamping would break the rename-over-itself idempotence);
  *   - `record_id` string (optional; default
  *     `<urn:graft:<tag>:<partition>:<ordinal>>` — deterministic per
  *     replay for the same reason).
  */
class GraftWarcWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder {
  private val queryTag = "q" + info.queryId().replace("-", "").take(12)
  private val dir = GraftWarc.dir(
    new org.apache.spark.sql.util.CaseInsensitiveStringMap(info.options()))

  private def colIdx(name: String, required: Boolean): Int = {
    val names = info.schema().fieldNames
    val idx = names.indexOf(name) match {
      case -1 => names.indexWhere(_.equalsIgnoreCase(name))
      case i => i
    }
    require(!required || idx >= 0, s"graft-warc writes need a '$name' column")
    idx
  }

  private val uriIdx = colIdx("target_uri", required = true)
  private val contentIdx = colIdx("content", required = true)
  private val typeIdx = colIdx("warc_type", required = false)
  private val dateIdx = colIdx("warc_date", required = false)
  private val idIdx = colIdx("record_id", required = false)
  private val langIdx = colIdx("content_language", required = false)
  require(info.schema().fields(uriIdx).dataType == StringType,
    "graft-warc 'target_uri' must be string")
  // optional columns get the same plan-time check as target_uri — a wrong
  // type must fail at build(), not as an executor-side ClassCastException
  Seq("warc_type" -> typeIdx, "warc_date" -> dateIdx, "record_id" -> idIdx,
      "content_language" -> langIdx).foreach {
    case (n, i) => require(i < 0 || info.schema().fields(i).dataType == StringType,
      s"graft-warc '$n' must be string, got ${info.schema().fields(i).dataType.catalogString}")
  }
  private val contentIsString = info.schema().fields(contentIdx).dataType match {
    case BinaryType => false
    case StringType => true
    case other => throw new IllegalArgumentException(
      s"graft-warc 'content' must be binary or string, got ${other.catalogString}")
  }
  private val cols = WarcWriteCols(uriIdx, contentIdx, contentIsString, typeIdx, dateIdx, idIdx, langIdx)

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      // per-JOB uuid tag: stable across task retries (idempotent
      // replacement), unique across jobs (Append adds) — the jsonl rule
      private val jobTag = "b" + java.util.UUID.randomUUID().toString
      override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
        new GraftWarcWriterFactory(dir, cols, jobTag)
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftWarcWrite.commitSegments(dir, jobTag, messages)
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        GraftWarcWrite.sweepTemps(dir, jobTag)
    }
    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory =
        new GraftWarcStreamingWriterFactory(dir, cols, queryTag)
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftWarcWrite.commitSegments(dir, f"$queryTag-$epochId%06d", messages)
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftWarcWrite.sweepTemps(dir, f"$queryTag-$epochId%06d")
    }
  }
}

/** Resolved input column indexes for the sink. */
case class WarcWriteCols(
    uri: Int, content: Int, contentIsString: Boolean,
    typ: Int, date: Int, id: Int, lang: Int = -1)

object GraftWarcWrite {
  /** Driver-side landing: rename every committed task's temp into its
    * final segment name (REPLACE_EXISTING — a replayed epoch replaces
    * itself), then sweep stray temps of the tag. Runs only after every
    * task committed, so abort can never race a rename (the jsonl rule).
    */
  private[warc] def commitSegments(
      dir: String, tag: String, messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftWarcCommit(tmpName, segment, _) if tmpName != null =>
        java.nio.file.Files.move(
          new File(dir, tmpName).toPath, new File(dir, segment).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        ()
      case _ => ()
    }
    sweepTemps(dir, tag)
  }

  private[warc] def sweepTemps(dir: String, tag: String): Unit = {
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s".seg-$tag-") &&
        f.getName.endsWith(".inprogress"))
      .foreach(_.delete())
  }
}

class GraftWarcWriterFactory(dir: String, cols: WarcWriteCols, tag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftWarcSegmentWriter(dir, cols, tag, partitionId, taskId)
}

class GraftWarcStreamingWriterFactory(dir: String, cols: WarcWriteCols, queryTag: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftWarcSegmentWriter(dir, cols, f"$queryTag-$epochId%06d", partitionId, taskId)
}

/** Task-side writer: lands ONLY its temp (no `.gz` suffix — invisible to
  * tailing readers); the rename happens at the driver's commit. Records
  * serialize as per-record gzip members through one close-shielded stream.
  */
class GraftWarcSegmentWriter(
    dir: String, cols: WarcWriteCols, tag: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val finalName = f"seg-$tag-$partitionId%04d.warc.gz"
  // temp carries the ATTEMPT's taskId: concurrent attempts never share a file
  private val tmpName = s".$finalName.$taskId.inprogress"
  private val tmp = new File(dir, tmpName)
  private var out: java.io.OutputStream = _
  private var shield: java.io.OutputStream = _
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (out == null) {
      java.nio.file.Files.createDirectories(new File(dir).toPath)
      out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 64 * 1024)
      shield = new java.io.FilterOutputStream(out) {
        override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
        override def close(): Unit = flush()
      }
    }
    val uri = row.getUTF8String(cols.uri)
    require(uri != null, "graft-warc: null target_uri row")
    val content =
      if (cols.contentIsString) {
        val v = row.getUTF8String(cols.content)
        require(v != null, "graft-warc: null content row")
        v.getBytes
      } else {
        val v = row.getBinary(cols.content)
        require(v != null, "graft-warc: null content row")
        v
      }
    def opt(idx: Int, default: String): String =
      if (idx < 0 || row.isNullAt(idx)) default else row.getUTF8String(idx).toString
    val headers = Seq(
      "WARC-Type" -> opt(cols.typ, "resource"),
      "WARC-Record-ID" -> opt(cols.id, s"<urn:graft:$tag:$partitionId:$n>"),
      "WARC-Date" -> opt(cols.date, "1970-01-01T00:00:00Z"),
      "WARC-Target-URI" -> uri.toString) ++
      // ISO 28500 §5: WARC-Identified-Content-Language — written only when
      // the caller identified one (real WET records carry it; no default)
      (if (cols.lang >= 0 && !row.isNullAt(cols.lang))
        Seq("WARC-Identified-Content-Language" -> row.getUTF8String(cols.lang).toString)
      else Nil)
    val gz = new java.util.zip.GZIPOutputStream(shield, 64 * 1024)
    gz.write(GraftWarc.recordBytes(headers, content))
    gz.close() // ends the member + its deflater; the shield keeps `out` open
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftWarcCommit(if (out == null) null else tmpName, finalName, n)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    tmp.delete()
    ()
  }

  override def close(): Unit = ()
}

case class GraftWarcCommit(tmpName: String, segment: String, rows: Long)
  extends WriterCommitMessage
