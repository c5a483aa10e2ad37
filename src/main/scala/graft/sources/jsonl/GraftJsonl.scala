package graft.sources.jsonl

import java.io.{File, RandomAccessFile}
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-jsonl` — the engine's SECOND DataSource V2 medium: a directory of
  * append-only JSONL files tailed as a log (`tail -f` semantics). Each
  * `*.jsonl` file is an independent log segment; the streaming offset is a
  * per-file BYTE position after the last complete (newline-terminated) line
  * consumed, so resume is an O(1) seek, a partial line at EOF (an append in
  * flight) waits for its newline, and truncation is detectable by
  * comparison alone. This is a deliberately different shape from both
  * `graft-kafka` (no broker metadata, no partition dirs, no dense record
  * offsets) and Spark's built-in file source (which only admits whole new
  * files and cannot tail a growing one) — the point of the medium is to
  * prove the offset/guarantee machinery is source-generic.
  *
  * Options:
  *   - `path` (required): the directory to tail;
  *   - `suffix` (default `.jsonl`): which files participate;
  *   - `startingOffsets` earliest|latest (first run only; a file that
  *     APPEARS mid-stream always starts at 0 — the Kafka new-partition
  *     rule);
  *   - `maxBytesPerTrigger`: admission cap, distributed proportionally to
  *     each file's backlog and always cut at a line boundary (the cap may
  *     be exceeded by at most one line per file — the same
  *     progress-over-precision rule as graft-kafka's maxOffsetsPerTrigger);
  *   - `failOnDataLoss` (default true): a checkpointed file that vanished
  *     with UNREAD scheduled bytes or shrank below its checkpoint (its
  *     consumed tail was truncated away) fails the query; `false` drops the
  *     vanished file and holds the shrunken one at its checkpoint until the
  *     file regrows past it (offsets never regress). A vanished file whose
  *     checkpointed position was fully consumed (zero unread bytes) is
  *     NEVER data loss in either mode — deleting a fully-consumed segment
  *     is routine log rotation;
  *   - `retireConsumed` (default true): drop a fully-consumed vanished
  *     file's entry from the offset map, so externally-rotated segments
  *     leave the checkpoint instead of being carried forever. `false`
  *     carries the entry silently (a deleted-and-recreated file name then
  *     resumes at its old position instead of replaying from 0);
  *   - `retentionMs`: ACTIVE retirement — the Kafka `retention.ms` analog
  *     for a medium whose "broker" is a directory: a file that is fully
  *     consumed (checkpoint == complete length == file length, no partial
  *     line in flight) and unmodified for at least `retentionMs` is DELETED
  *     by the source and its entry dropped. With retention on, the offset
  *     JSON, the checkpoint record, and the per-trigger stat loop are all
  *     bounded by the ACTIVE file set, not by stream age. Only sensible
  *     when this query owns the directory (a second consumer would lose
  *     the retired data — exactly Kafka's retention contract). Set the
  *     horizon LONGER than any producer's maximum replay window: a
  *     replayed sink epoch recreates its segment by name, and if the
  *     consumer already retired that name the recreated file reads from 0
  *     as new data (at-least-once re-delivery) — the same interplay as
  *     Kafka retention.ms vs a producer retrying past the retention
  *     horizon;
  *   - `retentionProperty`: id of a [[GraftJsonl.bindRetentionProperty]]
  *     registration — the DYNAMIC form of `retentionMs` (P4's
  *     trigger-boundary reconfiguration applied to the source): each
  *     trigger's planning reads the bound property's CURRENT value, so a
  *     live tail can tighten or loosen its retention horizon through the
  *     config control plane (file/remote supplier) without a restart.
  *     Property value -1 = no override (the static `retentionMs` option,
  *     if any, applies); >= 0 = the live horizon in milliseconds;
  *   - `maxSplitBytes`: BATCH reads split files larger than this into
  *     line-snapped byte-range partitions (default 128 MiB — one huge file
  *     is never one task). STREAMING reads split a catch-up slice the same
  *     way only when the option is set EXPLICITLY: the default
  *     one-partition-per-file-slice is the "one partition per
  *     topic-partition" ordering contract, and a split slice interleaves a
  *     key's records across tasks — opt in only if downstream reorders by
  *     the stable `(file, pos)` id.
  *
  * Schema: `(file string, pos long, value string)` — pos is the line's
  * starting byte offset in its file, so (file, pos) is a stable record id
  * replays reproduce exactly. Payload typing is schema-on-read
  * (`from_json` downstream), the reference's serde philosophy.
  *
  * The WRITE side ([[GraftJsonlWriteBuilder]]) closes the medium into a
  * file-based topic: each epoch's partitions land as immutable
  * `seg-q<queryTag>-<epoch>-<partition>.jsonl` segments via atomic rename
  * (idempotent under replay — effectively-once; the tag derives from the
  * checkpoint-stable query id so distinct queries sharing a directory
  * never collide), and a tailing reader discovers them as complete new
  * files.
  *
  * Scale shape: one Spark input partition per file slice per micro-batch —
  * parallelism is the file count, exactly the "one partition per
  * topic-partition" contract; a production layout shards the stream over
  * many files the way a topic shards over partitions. The driver never
  * reads data: per trigger it stats each file plus at most one 64 KiB
  * boundary probe per capped file.
  */
class GraftJsonlProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-jsonl"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftJsonl.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftJsonlTable(new CaseInsensitiveStringMap(properties))
}

object GraftJsonl {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Typed definition of the dynamic retention horizon (bind it to a
    * [[graft.config.FilePropertySupplier]]/remote supplier like any other
    * engine property). -1 disables the override; >= 0 is the live horizon.
    */
  val RetentionMsProperty: graft.config.PropertyDefinition[Long] =
    graft.config.PropertyDefinition("graft.jsonl.retention.ms", -1L, (v: Long) => v >= -1L)

  // DSv2 options are strings, so a live property reaches the source by ID:
  // bind the DynamicProperty here, pass `retentionProperty=<id>` as an
  // option, and each trigger's driver-side planning reads the current
  // value. JVM-static like the rest of the driver-side control plane.
  private val retentionOverrides =
    new java.util.concurrent.ConcurrentHashMap[String, graft.config.DynamicProperty[Long]]()

  /** Register `dyn` as the live retention horizon for sources opened with
    * `retentionProperty=id`. Returns a deregistration handle.
    */
  def bindRetentionProperty(id: String, dyn: graft.config.DynamicProperty[Long]): () => Unit = {
    retentionOverrides.put(id, dyn)
    () => { retentionOverrides.remove(id, dyn); () }
  }

  /** The override's current value, if bound and enabled (>= 0). */
  private[jsonl] def retentionOverride(id: String): Option[Long] =
    Option(retentionOverrides.get(id)).map(_.value).filter(_ >= 0L)

  def dir(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "graft-jsonl requires the 'path' option (directory to tail)")
    p
  }

  /** Participating files, name-sorted for deterministic planning order. */
  def listFiles(dir: String, suffix: String): Seq[File] = {
    val d = new File(dir)
    require(d.isDirectory, s"graft-jsonl path is not a directory: $dir")
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(suffix))
      .sortBy(_.getName).toSeq
  }

  /** Byte position after the file's last complete line: the file length if
    * it ends in '\n', else the position after the last '\n' (a partial
    * append stays invisible until terminated — tail semantics). Backward
    * chunk scan from EOF; 0 if the file has no newline at all.
    */
  def completeLength(f: File): Long = {
    val raf = new RandomAccessFile(f, "r")
    try {
      val len = raf.length()
      if (len == 0L) return 0L
      raf.seek(len - 1)
      if (raf.read() == '\n') return len
      lastNewlineBefore(raf, len).map(_ + 1).getOrElse(0L)
    } finally raf.close()
  }

  /** Highest position p < limit with byte '\n' at p, scanning backward in
    * 64 KiB chunks; None if no newline exists before `limit`.
    */
  private def lastNewlineBefore(raf: RandomAccessFile, limit: Long): Option[Long] = {
    val chunk = new Array[Byte](64 * 1024)
    var hi = limit
    while (hi > 0L) {
      val lo = math.max(0L, hi - chunk.length)
      val n = (hi - lo).toInt
      raf.seek(lo)
      raf.readFully(chunk, 0, n)
      var i = n - 1
      while (i >= 0) {
        if (chunk(i) == '\n') return Some(lo + i)
        i -= 1
      }
      hi = lo
    }
    None
  }

  /** First position p >= from with byte '\n' at p, forward 64 KiB chunks;
    * None if the rest of the file has none.
    */
  private def firstNewlineFrom(raf: RandomAccessFile, from: Long): Option[Long] = {
    val chunk = new Array[Byte](64 * 1024)
    val len = raf.length()
    var lo = from
    while (lo < len) {
      val n = math.min(chunk.length.toLong, len - lo).toInt
      raf.seek(lo)
      raf.readFully(chunk, 0, n)
      var i = 0
      while (i < n) {
        if (chunk(i) == '\n') return Some(lo + i)
        i += 1
      }
      lo += n
    }
    None
  }

  /** Largest line-boundary end in (from, target]; if the first line starting
    * at `from` already overruns `target`, extend to its terminating newline
    * instead (progress guarantee — the admission cap yields, never starves).
    * `from` and the result are both positions AFTER a '\n' (or 0/EOF).
    */
  def lineBoundaryNear(f: File, from: Long, target: Long): Long = {
    val raf = new RandomAccessFile(f, "r")
    try {
      lastNewlineBefore(raf, math.min(target, raf.length())) match {
        case Some(p) if p >= from => p + 1
        case _ =>
          firstNewlineFrom(raf, math.max(from, target)) match {
            case Some(p) => p + 1
            case None    => from // no complete line yet — no progress to make
          }
      }
    } finally raf.close()
  }

  /** Driver-side landing of one job's/epoch's segments: atomically rename
    * every committed task's temp into its final name (REPLACE_EXISTING —
    * a replayed epoch replaces itself), then sweep stray temps of the same
    * tag (failed/speculative attempts whose messages never reached the
    * driver). Runs ONLY after every task committed, so an abort can never
    * race a rename: no final name appears for a job that did not commit.
    */
  /** Streaming segments were named `seg-<epoch>-<part>.jsonl` before the
    * query tag landed in the name. A checkpoint created under the old naming
    * that replays its last epoch after an upgrade writes a NEW tagged name
    * instead of renaming over the old one — the legacy twin would duplicate
    * that epoch's records once. Landing a tagged streaming segment therefore
    * retires its legacy-named twin, but ONLY when the twin is byte-identical
    * to the landed segment: a true replay twin is content-identical by the
    * deterministic replay contract, whereas a same-numbered segment from an
    * UNRELATED untagged run (fresh-checkpoint tagged query whose epochs
    * restart at 0, sharing a directory with an older run) is that run's
    * committed data and must survive. A twin that is not byte-identical is
    * left in place — worst case the upgrade replay duplicates one epoch's
    * records (the documented at-least-once upgrade story), never loses data.
    */
  private val LegacyStreamTwin = """seg-q[0-9a-f]{12}-(\d{6}-\d{4}\.jsonl)""".r

  /** Byte-equality of two files without loading either fully into memory. */
  private def sameContent(a: File, b: File): Boolean = {
    if (a.length() != b.length()) return false
    val ia = new java.io.BufferedInputStream(new java.io.FileInputStream(a))
    try {
      val ib = new java.io.BufferedInputStream(new java.io.FileInputStream(b))
      try {
        var x = 0
        while ({ x = ia.read(); x != -1 }) if (ib.read() != x) return false
        ib.read() == -1
      } finally ib.close()
    } finally ia.close()
  }

  private[jsonl] def commitSegments(
      dir: String,
      tag: String,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    messages.foreach {
      case GraftJsonlCommit(tmpName, segment, _) if tmpName != null =>
        java.nio.file.Files.move(
          new File(dir, tmpName).toPath, new File(dir, segment).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        segment match {
          case LegacyStreamTwin(suffix) =>
            val legacy = new File(dir, s"seg-$suffix")
            if (legacy.exists() && sameContent(legacy, new File(dir, segment)))
              legacy.delete()
          case _ => ()
        }
      case _ => ()
    }
    sweepTemps(dir, tag)
  }

  /** Abort cleanup: only temps can exist (renames are commit-side). */
  private[jsonl] def abortSegments(dir: String, tag: String): Unit =
    sweepTemps(dir, tag)

  private def sweepTemps(dir: String, tag: String): Unit = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(s".seg-$tag-") &&
        f.getName.endsWith(".inprogress"))
      .foreach(_.delete())
  }

  /** Plan byte-range partitions for `[from, until)` of one file: a single
    * aligned partition when the range fits in `split`, else ceil-div ranges
    * with the first-byte ownership rule (`aligned = false`). All arithmetic
    * in Long — a TB-scale file over a small split must error loudly, not
    * wrap `.toInt` negative and silently plan ZERO partitions.
    */
  private[graft] def splitRange(
      path: String, name: String, from: Long, until: Long, split: Long,
      failOnDataLoss: Boolean): Seq[GraftJsonlInputPartition] = {
    require(split > 0, s"split size must be positive, got $split")
    if (until - from <= split)
      Seq(GraftJsonlInputPartition(path, name, from, until, failOnDataLoss))
    else {
      val n = (until - from + split - 1) / split
      require(n <= Int.MaxValue,
        s"$name: [$from, $until) at split=$split would need $n partitions — raise maxSplitBytes")
      (0L until n).map { i =>
        GraftJsonlInputPartition(path, name, from + i * split,
          math.min(from + (i + 1) * split, until), failOnDataLoss, aligned = false)
      }
    }
  }

  /** Append lines (adding the terminating '\n' each) to `dir/name` — the
    * producer util the chaos/roundtrip harnesses write through. Appends are
    * sequential per call; callers provide cross-call ordering.
    */
  def append(dir: String, name: String, lines: Seq[String]): Unit = {
    val f = new File(dir, name)
    val out = new java.io.FileOutputStream(f, true)
    try {
      val sb = new StringBuilder
      lines.foreach { l =>
        require(!l.contains('\n'), "a JSONL record must be newline-free")
        require(!l.endsWith("\r"),
          "a JSONL record must not end in '\\r' (the reader strips a trailing CR so CRLF " +
            "corpora read like LF — such a value would not round-trip)")
        sb.append(l).append('\n')
      }
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    } finally out.close()
  }
}

/** Streaming offset: per-file byte position after the last consumed complete
  * line, serialized as sorted JSON `{"a.jsonl":123,"b.jsonl":0}`. File names
  * are JSON-escaped — quotes/backslashes AND control characters: a newline
  * is a legal Linux filename byte, and Spark's offset log is line-oriented,
  * so an unescaped emission would split the checkpoint record and make
  * `fromJson` mis-parse on restart (truncated name → re-read from 0 →
  * duplicates).
  */
case class GraftJsonlOffset(positions: Map[String, Long]) extends Offset {
  override def json(): String =
    positions.toSeq.sortBy(_._1)
      .map { case (f, p) => s""""${GraftJsonlOffset.escape(f)}":$p""" }
      .mkString("{", ",", "}")
}

object GraftJsonlOffset {
  // shared with graft-kafka's offset serializer — see graft.sources.OffsetJson
  private[jsonl] def escape(s: String): String = graft.sources.OffsetJson.escape(s)
  private[jsonl] def unescape(s: String): String = graft.sources.OffsetJson.unescape(s)

  def fromJson(s: String): GraftJsonlOffset = {
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*([0-9]+)""".r
    GraftJsonlOffset(entry.findAllMatchIn(s).map { m =>
      unescape(m.group(1)) -> m.group(2).toLong
    }.toMap)
  }
}

class GraftJsonlTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-jsonl(${GraftJsonl.dir(options)})"
  override def schema(): StructType = GraftJsonl.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftJsonlScan(scanOptions)
    }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftJsonlWriteBuilder(info)
}

/** The write side of the medium: each epoch's partition becomes ONE new
  * immutable segment file `seg-q<queryTag>-<epoch>-<partition>.jsonl`
  * (streaming; batch uses a per-job uuid tag; empty partitions
  * write nothing), landed by write-to-temp + atomic rename at task commit.
  * The temp name carries no `.jsonl` suffix, so a tailing reader never sees
  * a half-written segment — segments APPEAR complete, exactly the
  * new-file-discovery path the source already handles.
  *
  * EFFECTIVELY-ONCE: the segment name is a pure function of (epoch,
  * partition), so a replayed micro-batch (or a re-attempted task) renames
  * over its own previous output instead of appending a duplicate — the same
  * batch-id-keyed idempotence contract as
  * [[graft.streaming.StreamOps.effectivelyOnceParquet]], proven by the same
  * drop-the-commit-marker replay test. The contract holds as long as the
  * replaced name is still the one the reader's checkpoint points at; a
  * consumer running `retentionMs` shorter than the producer's replay window
  * can retire the name first, after which the replayed segment reads as new
  * data (see the retentionMs option note — the Kafka retention analog has
  * the same horizon rule). Input rows must carry a string
  * `value` column (newline-free); everything else is ignored — the Kafka
  * sink's value-column contract.
  */
class GraftJsonlWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder {
  // streaming epoch tag prefix, derived from the CHECKPOINT-STABLE query id
  // (verified stable across restarts): a replayed epoch still renames over
  // its own segment (effectively-once), while two streaming queries
  // writing one directory can no longer clobber each other's same-numbered
  // epochs or sweep each other's live temps — the multi-writer hole the
  // batch path already closed with its per-job uuid tag.
  // CHECKPOINT COMPATIBILITY: before the tag, streaming segments were named
  // `seg-<epoch>-<part>.jsonl`; a pre-tag checkpoint replaying its last
  // epoch after upgrade lands a tagged name instead of renaming over the
  // legacy one — commitSegments deletes the legacy twin at landing so the
  // replayed epoch cannot read back twice (see LegacyStreamTwin).
  private val queryTag = "q" + info.queryId().replace("-", "").take(12)
  private val dir = GraftJsonl.dir(new CaseInsensitiveStringMap(info.options()))
  private val valueIdx = {
    // case-insensitive with exact-match preference — the Kafka sink's
    // value-column contract resolves through Spark's (default
    // case-insensitive) resolver, so `Value` must work here too
    val names = info.schema().fieldNames
    val idx = names.indexOf("value") match {
      case -1 => names.indexWhere(_.equalsIgnoreCase("value"))
      case i  => i
    }
    require(idx >= 0, "graft-jsonl writes need a 'value' string column")
    require(info.schema().fields(idx).dataType == StringType,
      s"graft-jsonl 'value' must be string, got ${info.schema().fields(idx).dataType.catalogString}")
    idx
  }

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      // per-JOB unique tag, generated once on the driver: stable across task
      // retries inside this job (idempotent replacement), unique across jobs
      // (a second SaveMode.Append must ADD segments, not rename over the
      // previous write's names). FULL uuid: a truncated tag's birthday
      // collisions would silently REPLACE_EXISTING an earlier append's
      // segment on a long-lived directory.
      private val jobTag = "b" + java.util.UUID.randomUUID().toString
      override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
        new GraftJsonlWriterFactory(dir, valueIdx, jobTag)
      override def commit(messages: Array[WriterCommitMessage]): Unit =
        GraftJsonl.commitSegments(dir, jobTag, messages)
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        GraftJsonl.abortSegments(dir, jobTag)
    }
    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory =
        new GraftJsonlStreamingWriterFactory(dir, valueIdx, queryTag)
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftJsonl.commitSegments(dir, f"$queryTag-$epochId%06d", messages)
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
        GraftJsonl.abortSegments(dir, f"$queryTag-$epochId%06d")
    }
  }
}

class GraftJsonlWriterFactory(dir: String, valueIdx: Int, epochTag: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftJsonlSegmentWriter(dir, valueIdx, epochTag, partitionId, taskId)
}

class GraftJsonlStreamingWriterFactory(dir: String, valueIdx: Int, queryTag: String)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new GraftJsonlSegmentWriter(dir, valueIdx, f"$queryTag-$epochId%06d", partitionId, taskId)
}

/** Task-side writer: lands ONLY its temp file. The rename into the visible
  * segment name happens at the DRIVER's job/epoch commit
  * ([[GraftJsonl.commitSegments]]): a task-side rename would race job
  * abort — a task already authorized by the commit coordinator can finish
  * its rename after abort's cleanup scan ran, leaving an orphan segment
  * a retried job (under a fresh tag) would then duplicate. With the
  * driver doing every rename, abort at most deletes temps and no final
  * name can appear for a job/epoch that did not commit.
  */
class GraftJsonlSegmentWriter(
    dir: String, valueIdx: Int, epochTag: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val finalName = f"seg-$epochTag-$partitionId%04d.jsonl"
  // temp name carries the ATTEMPT's taskId: concurrent attempts of the same
  // partition (speculation, zombie tasks) must not write/truncate/delete one
  // shared temp file — the commit-coordinator-approved attempt's temp is the
  // one whose message reaches the driver. No .jsonl suffix: invisible to
  // tailing readers.
  private val tmpName = s".$finalName.$taskId.inprogress"
  private val tmp = new File(dir, tmpName)
  private var out: java.io.OutputStream = _
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    val v = row.getUTF8String(valueIdx)
    require(v != null, "graft-jsonl: null value row")
    val bytes = v.getBytes
    var i = 0
    while (i < bytes.length) {
      require(bytes(i) != '\n', "a JSONL record must be newline-free")
      i += 1
    }
    // the reader strips one trailing CR (CRLF tolerance) — a value ending
    // in '\r' would silently lose that byte on the way back, so the sink
    // rejects it up front instead of breaking the round-trip contract
    require(bytes.isEmpty || bytes(bytes.length - 1) != '\r',
      "a JSONL record must not end in '\\r' (it would not round-trip through the CRLF-tolerant reader)")
    if (out == null) {
      java.nio.file.Files.createDirectories(new File(dir).toPath)
      out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 64 * 1024)
    }
    out.write(bytes)
    out.write('\n')
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (out != null) out.close()
    GraftJsonlCommit(if (out == null) null else tmpName, finalName, n)
  }

  override def abort(): Unit = {
    if (out != null) out.close()
    tmp.delete()
    ()
  }

  override def close(): Unit = ()
}

case class GraftJsonlCommit(tmpName: String, segment: String, rows: Long)
  extends WriterCommitMessage

class GraftJsonlScan(options: CaseInsensitiveStringMap) extends Scan {
  private val dir = GraftJsonl.dir(options)
  private val suffix = options.getOrDefault("suffix", ".jsonl")
  private val failOnDataLoss = options.getBoolean("failondataloss", true)
  private val maxSplitBytes = {
    val v = options.getLong("maxsplitbytes", 128L << 20)
    require(v > 0, s"maxSplitBytes must be positive, got $v")
    v
  }

  override def readSchema(): StructType = GraftJsonl.schema

  /** Batch read: the complete-line snapshot of every file at planning time.
    * `failOnDataLoss` rides into the partitions so a file deleted between
    * planning and task execution (log rotation) honors the option on the
    * batch path too, not only the streaming one.
    *
    * A file larger than `maxSplitBytes` (default 128 MiB) is planned as
    * MULTIPLE byte-range partitions — the classic line-snapped text split:
    * the driver plans raw byte ranges (no boundary probes — O(1) per
    * split), and each reader resolves its own boundaries by the
    * first-byte-ownership rule ([[GraftJsonlInputPartition]]). Without
    * this, one multi-GB JSONL file would read on a single task no matter
    * how many executors the cluster has.
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftJsonl.listFiles(dir, suffix).flatMap { f =>
        try {
          val complete = GraftJsonl.completeLength(f)
          GraftJsonl.splitRange(f.getPath, f.getName, 0L, complete, maxSplitBytes,
            failOnDataLoss): Seq[InputPartition]
        } catch {
          // FileNotFound = vanished between list and stat; EOF = truncated
          // mid-probe (copy-then-truncate rotation) — both are the same
          // planning-time loss race
          case e @ (_: java.io.FileNotFoundException | _: java.io.EOFException) =>
            if (failOnDataLoss) throw new IllegalStateException(
              s"data loss detected on ${f.getName}: file vanished or was truncated during " +
                "batch planning. Set failOnDataLoss=false to drop it.", e)
            Seq.empty[InputPartition]
        }
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = new GraftJsonlReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftJsonlMicroBatchStream(dir, suffix,
      startAtLatest = options.getOrDefault("startingoffsets", "earliest")
        .equalsIgnoreCase("latest"),
      failOnDataLoss = failOnDataLoss,
      maxBytesPerTrigger = Option(options.get("maxbytespertrigger")).map { v =>
        require(v.toLong > 0, s"maxBytesPerTrigger must be positive, got $v")
        v.toLong
      },
      retireConsumed = options.getBoolean("retireconsumed", true),
      retentionMs = Option(options.get("retentionms")).map { v =>
        // 0 = retire as soon as fully consumed; negative is always a
        // misconfiguration and must not silently mean "delete everything"
        require(v.toLong >= 0, s"retentionMs must be >= 0, got $v")
        v.toLong
      },
      retentionPropertyId = Option(options.get("retentionproperty")).filter(_.nonEmpty),
      // streaming splits are OPT-IN: the default one-partition-per-file-slice
      // is the "one partition per topic-partition" ordering contract — a
      // split catch-up slice interleaves a key's records across tasks, so
      // only a caller who accepts (file, pos)-based reordering may ask for it
      maxSplitBytes = Option(options.get("maxsplitbytes")).map(_.toLong))
}

class GraftJsonlMicroBatchStream(
    dir: String,
    suffix: String,
    startAtLatest: Boolean,
    failOnDataLoss: Boolean,
    maxBytesPerTrigger: Option[Long],
    retireConsumed: Boolean = true,
    retentionMs: Option[Long] = None,
    retentionPropertyId: Option[String] = None,
    maxSplitBytes: Option[Long] = None) extends MicroBatchStream with SupportsAdmissionControl {

  /** The trigger-boundary retention horizon: a bound live property (>= 0)
    * overrides the static option — read at each planning call, so a config
    * edit takes effect on the NEXT trigger, no restart (P4 applied to the
    * source).
    */
  private def effectiveRetentionMs: Option[Long] =
    retentionPropertyId.flatMap(GraftJsonl.retentionOverride).orElse(retentionMs)

  private def files: Seq[File] = GraftJsonl.listFiles(dir, suffix)

  /** name -> (length, lastModified, completeLength) memo. A fully-landed
    * immutable segment never changes, so its boundary probe (an open + a
    * backward 64 KiB scan) need not repeat every trigger — with the cache
    * the steady-state per-trigger driver cost is ONE stat per listed file,
    * and with `retentionMs` the listed set itself is bounded. (length,
    * mtime) keying is the same freshness contract Spark's own file source
    * uses; any append or truncation changes the length.
    */
  private val probeCache = scala.collection.mutable.HashMap.empty[String, (Long, Long, Long)]

  private def completeLengthCached(f: File): Long = {
    val len = f.length(); val mtime = f.lastModified()
    probeCache.get(f.getName) match {
      case Some((l, m, c)) if l == len && m == mtime => c
      case _ =>
        val c = GraftJsonl.completeLength(f)
        probeCache.put(f.getName, (len, mtime, c))
        c
    }
  }

  // a file vanishing between the listing and its probe (rotation mid-call)
  // is dropped from the snapshot — the next trigger's listing is the truth
  private def snapshotSafe(pos: File => Long): Map[String, Long] =
    files.flatMap { f =>
      try Some(f.getName -> pos(f))
      catch { case _: java.io.FileNotFoundException | _: java.io.EOFException => None }
    }.toMap

  override def initialOffset(): Offset =
    GraftJsonlOffset(snapshotSafe(f =>
      if (startAtLatest) GraftJsonl.completeLength(f) else 0L))

  override def deserializeOffset(json: String): Offset = GraftJsonlOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(Offset, ReadLimit) is used")

  /** End-of-complete-data per file, capped to ~maxBytesPerTrigger of new
    * bytes distributed proportionally to each file's backlog, every cut on
    * a line boundary. The end offset NEVER regresses below the checkpoint:
    * a truncated file is a data-loss error here in strict mode (reporting
    * it only at plan time leaves a race — the file can regrow between the
    * two calls and an end below the checkpoint would then COMMIT, replaying
    * new bytes under previously-issued (file, pos) ids); with
    * `failOnDataLoss=false` the clamped offset simply waits until the file
    * regrows past its checkpoint. A file that vanished between the listing
    * and its stat (log rotation mid-trigger) is treated exactly like a
    * checkpointed-but-missing file: its position is carried unchanged and
    * planInputPartitions decides per failOnDataLoss.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startPos = start.asInstanceOf[GraftJsonlOffset].positions
    def startOf(name: String): Long = startPos.getOrElse(name, 0L)
    def statSafe[A](f: File)(body: => A): Option[A] =
      try Some(body)
      catch {
        // vanished OR truncated mid-probe: both resolve at the next trigger
        // (the vanished map / the clamped offset handle each)
        case _: java.io.FileNotFoundException | _: java.io.EOFException => None
      }
    val fs = files
    val listed = fs.iterator.map(_.getName).toSet
    val complete = fs.flatMap(f =>
      statSafe(f)(completeLengthCached(f)).map(f.getName -> _)).toMap
    // vanished-with-KNOWN-backlog check, keyed on the files that actually
    // STATTED (not merely listed — a file can vanish between the listing
    // and its stat) and run BEFORE cache eviction: the probe cache is the
    // only witness that a vanished file had complete bytes beyond the
    // checkpoint (observed but never scheduled — e.g. deferred by the
    // admission cap). Within a run, strict mode must report that loss;
    // across a restart the cache is empty and a pre-restart append is
    // unobservable — indistinguishable from consumed-then-rotated, so
    // benign by the fully-consumed rule.
    if (failOnDataLoss) startPos.foreach { case (name, p) =>
      if (!complete.contains(name)) probeCache.get(name).foreach { case (_, _, c) =>
        if (c > p) throw new IllegalStateException(
          s"data loss detected on $name: file vanished with ${c - p} observed-but-unconsumed " +
            "bytes beyond the checkpoint. Set failOnDataLoss=false to drop it and continue.")
      }
    }
    // evict to the LISTED set, not the statted one: a listed file whose
    // stat failed this trigger keeps its witness entry for the check above
    probeCache.filterInPlace { case (name, _) => listed(name) }
    complete.foreach { case (name, c) =>
      if (c < startOf(name) && failOnDataLoss)
        throw new IllegalStateException(
          s"data loss detected on $name: consumed through byte ${startOf(name)} but only " +
            s"$c complete bytes remain (truncated). Set failOnDataLoss=false to wait for " +
            "the file to regrow past its checkpoint.")
    }
    // ACTIVE retirement (the Kafka retention.ms analog): a fully-consumed,
    // fully-landed file (checkpoint == complete length == raw length — no
    // partial line in flight) unmodified for retentionMs is DELETED and its
    // entry dropped, so the offset map, the checkpoint record and the
    // per-trigger stat loop stay bounded by the ACTIVE file set instead of
    // stream age. Only files with nothing left to schedule qualify, so no
    // planned bytes can ever dangle behind a retirement; a crash between
    // the delete and the offset commit replays as a vanished-but-consumed
    // file, which the planner treats as benign (never data loss).
    // startOf == c EXACTLY: `>=` would also match a file truncated BELOW
    // its checkpoint, which permissive mode holds until it regrows — a
    // file whose current content was never delivered must not be deleted.
    // The retention horizon doubles as the producer-quiescence guard:
    // only files unmodified for retentionMs qualify, so a producer that
    // appends within the horizon is never raced; an append landing in the
    // same instant as the delete is the same torn-rotation hazard as any
    // external log-rotation delete (retention is for directories whose
    // landed files are immutable — the sink's segments are by
    // construction).
    val retired: Set[String] = effectiveRetentionMs match {
      case Some(ret) =>
        val now = System.currentTimeMillis()
        val candidates = fs.filter { f =>
          val name = f.getName
          complete.get(name).exists(c => startOf(name) == c &&
            statSafe(f)(f.length()).contains(c) &&
            now - f.lastModified() >= ret)
        }
        // the delete is the act of retirement: only names whose delete
        // succeeded leave the offset (a failed delete stays active)
        candidates.filter(_.delete()).map(_.getName).toSet
      case None => Set.empty
    }
    val ends: Map[String, Long] = maxBytesPerTrigger match {
      case Some(cap) =>
        val capped = fs.filter(f => complete.contains(f.getName) && !retired(f.getName))
        val backlog = capped.map(f => f -> math.max(0L, complete(f.getName) - startOf(f.getName)))
        val total = backlog.map(_._2).sum
        if (total <= cap) complete -- retired
        else {
          val scale = cap.toDouble / total
          backlog.map { case (f, b) =>
            val name = f.getName
            if (b == 0L) name -> complete(name)
            else {
              val share = math.max(1L, math.floor(b * scale).toLong)
              statSafe(f)(GraftJsonl.lineBoundaryNear(f, startOf(name), startOf(name) + share))
                .map(name -> _).getOrElse(name -> startOf(name)) // vanished mid-probe
            }
          }.toMap
        }
      case None => complete -- retired
    }
    val clamped = ends.map { case (name, e) => name -> math.max(e, startOf(name)) }
    // A checkpointed file absent from the listing has, by construction, a
    // position equal to everything ever SCHEDULED from it (each batch's end
    // becomes the next start before any new schedule), and the
    // known-backlog check above already reported any OBSERVED loss — so its
    // deletion is routine log rotation, not data loss. With retireConsumed
    // (default) the entry is dropped so the offset map stays bounded by the
    // active file set; with retireConsumed=false it is carried silently
    // even when retentionMs is set (a deleted-then-recreated name then
    // resumes at its old position instead of replaying from 0 — the
    // behavior that option buys). Names retention retired THIS trigger are
    // excluded from the carry explicitly: they must leave the committed
    // offset, or the carry would resurrect them every trigger and the
    // offset JSON would grow with stream age despite retention. A file
    // that vanishes MID-trigger (after a successful stat) still carries
    // scheduled bytes in `clamped` and is reported by planInputPartitions
    // per failOnDataLoss.
    // a LISTED file whose stat raced (shrunk/rotated mid-probe) is NOT
    // vanished — the file exists and resolves next trigger. Its entry must
    // carry unchanged in every mode: dropping it would restart the name at
    // 0 (silent re-delivery / offset regression). Names retention retired
    // this trigger are in the pre-delete listing, so exclude them here.
    val statRaced = startPos.view.filterKeys(k =>
      listed(k) && !clamped.contains(k) && !retired(k)).toMap
    val vanished =
      if (retireConsumed) Map.empty[String, Long]
      else startPos.view.filterKeys(k =>
        !listed(k) && !clamped.contains(k) && !retired(k)).toMap
    GraftJsonlOffset(clamped ++ statRaced ++ vanished)
  }

  override def reportLatestOffset(): Offset =
    GraftJsonlOffset(snapshotSafe(completeLengthCached))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startPos = start.asInstanceOf[GraftJsonlOffset].positions
    val endPos = end.asInstanceOf[GraftJsonlOffset].positions
    val out = ArrayBuffer.empty[InputPartition]
    endPos.toSeq.sortBy(_._1).foreach { case (name, until) =>
      val f = new File(dir, name)
      val from = startPos.getOrElse(name, 0L) // appeared mid-stream: earliest
      if (!f.isFile) {
        // a vanished file with zero unread SCHEDULED bytes (until == from)
        // is routine rotation of a fully-consumed segment, never data loss
        if (until > from && failOnDataLoss)
          throw new IllegalStateException(
            s"data loss detected on $name: file vanished with ${until - from} unread bytes " +
              "checkpointed. Set failOnDataLoss=false to drop it and continue.")
        // else: drop the file from the plan
      } else {
        val len = f.length()
        if (len < from) {
          if (failOnDataLoss)
            throw new IllegalStateException(
              s"data loss detected on $name: consumed through byte $from but the file now has " +
                s"only $len bytes (truncated). Set failOnDataLoss=false to hold at the " +
                "checkpoint until the file regrows past it.")
          // truncated tail: nothing to read until the file regrows past its
          // checkpoint; re-appended bytes arrive as new records
        } else if (until > from) {
          if (len < until && failOnDataLoss)
            // truncated between latestOffset and planning: the checkpoint
            // will still commit end=until, so a silent clamp would skip
            // bytes [len, until) forever if the file regrows — the same
            // regrow race latestOffset plugs. Strict mode must report it;
            // only permissive mode clamps (its reader emits the intact
            // lines below the cut and drops any torn tail).
            throw new IllegalStateException(
              s"data loss detected on $name: $until bytes were scheduled but the file now has " +
                s"only $len (truncated mid-trigger). Set failOnDataLoss=false to read what " +
                "remains and drop the truncated tail.")
          // with maxSplitBytes set (opt-in), a catch-up slice larger than it
          // (first trigger over a deep backlog with no admission cap) splits
          // into byte-range partitions, same ownership rule as the batch
          // path. The slice's `from` is a checkpointed line boundary (byte
          // from-1 is '\n'), so the unaligned reader's one-byte-back probe
          // self-detects it and skips nothing.
          val hi = math.min(until, len)
          out ++= GraftJsonl.splitRange(f.getPath, name, from, hi,
            maxSplitBytes.getOrElse(Long.MaxValue), failOnDataLoss)
        }
      }
    }
    out.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftJsonlReaderFactory
  override def commit(end: Offset): Unit = () // progress lives in Spark's checkpoint
  override def stop(): Unit = ()
}

/** One Spark partition per file slice. `aligned = true` (streaming, whole
  * files) means `from`/`until` are exact line boundaries; `aligned = false`
  * (batch byte-range splits) means raw byte positions with the classic
  * text-split ownership rule: a line belongs to the split containing its
  * FIRST byte — the reader skips a partial line at `from` and reads past
  * `until` to finish the last line it owns.
  */
case class GraftJsonlInputPartition(
    path: String, name: String, from: Long, until: Long, failOnDataLoss: Boolean = true,
    aligned: Boolean = true)
  extends InputPartition

class GraftJsonlReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftJsonlInputPartition]
    // the file can vanish between planning's isFile check and this open (log
    // rotation mid-trigger): permissive mode reads the slice as empty — the
    // same drop-the-file semantics the planner applies when it sees the
    // vanish first; strict mode reports the loss instead of a raw IO error
    val rafOpt =
      try Some(new RandomAccessFile(p.path, "r"))
      catch {
        case e: java.io.FileNotFoundException =>
          if (p.failOnDataLoss)
            throw new IllegalStateException(
              s"data loss detected on ${p.name}: file vanished after planning with " +
                s"${p.until - p.from} planned bytes. Set failOnDataLoss=false to drop it.", e)
          None
      }
    rafOpt match {
      case None => new PartitionReader[InternalRow] {
        override def next(): Boolean = false
        override def get(): InternalRow = throw new IllegalStateException("empty reader")
        override def close(): Unit = ()
      }
      case Some(r0) => mkReader(p, r0)
    }
  }

  private def mkReader(p: GraftJsonlInputPartition, raf0: RandomAccessFile): PartitionReader[InternalRow] = {
    new PartitionReader[InternalRow] {
      private val raf = raf0
      // unaligned byte-range split: `from` may land mid-line. Start one byte
      // early — if the byte before `from` is '\n', `from` is a line start
      // and nothing is skipped; otherwise the line containing byte from-1
      // belongs to the PREVIOUS split (which reads past its own `until` to
      // finish it), so consume through its terminating newline.
      private val startAt = if (p.aligned || p.from == 0L) p.from else p.from - 1
      raf.seek(startAt)
      private val in = new java.io.BufferedInputStream(
        java.nio.channels.Channels.newInputStream(raf.getChannel), 64 * 1024)
      private var pos = startAt
      private var exhausted = false
      // EOF below the planned `until` is truncation-AFTER-planning: every
      // byte below the planning-time complete length belongs to a
      // newline-terminated line, so the planned range can only run dry if
      // the file shrank since. The checkpoint still commits end = until,
      // so a silent stop here would skip the missing bytes forever if the
      // file regrows — strict mode must report it (the same regrow race
      // latestOffset and planInputPartitions already plug at their steps);
      // permissive mode ends the task, delivering the intact lines below
      // the cut. (A partial tail line never reaches this: `until` is at or
      // below the complete length, so its line start is already >= until.)
      private def truncatedMidRead(): Boolean = {
        if (p.failOnDataLoss) throw new IllegalStateException(
          s"data loss detected on ${p.name}: file truncated below planned byte ${p.until} " +
            s"while reading (at byte $pos). Set failOnDataLoss=false to keep what remains.")
        true
      }
      if (startAt < p.from) {
        var done = false
        while (!done) {
          val b = in.read()
          if (b == -1) { exhausted = truncatedMidRead(); done = true }
          else { pos += 1; done = b == '\n' } // pos counts only consumed bytes
        }
      }
      private var linePos = 0L
      private var line: Array[Byte] = _
      private val buf = new java.io.ByteArrayOutputStream(256)

      override def next(): Boolean = {
        if (exhausted || pos >= p.until) return false
        linePos = pos
        buf.reset()
        var b = in.read()
        while (b != -1 && b != '\n') { buf.write(b); b = in.read() }
        if (b == -1) return !truncatedMidRead()
        pos += buf.size() + 1
        line = buf.toByteArray
        true
      }

      override def get(): InternalRow = {
        // strip a trailing '\r' so CRLF corpora read identically to LF ones
        val n = if (line.nonEmpty && line(line.length - 1) == '\r') line.length - 1 else line.length
        InternalRow(
          UTF8String.fromString(p.name),
          linePos,
          UTF8String.fromBytes(line, 0, n))
      }

      override def close(): Unit = raf.close()
    }
  }
}
