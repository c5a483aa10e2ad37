package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** Maintenance for document-sink segment directories (`graft-warc` /
  * `graft-jsonl`): a weeks-long stream lands one immutable segment per
  * (epoch, partition) and nothing ever folds or expires them — the same
  * gap the self-index tier closed in
  * [[graft.streaming.SelfIndexCompaction]]. Three tools:
  *
  *   - '''Compaction''' ([[compactSegments]]): fold the oldest segments
  *     into ONE by byte concatenation — both media are concatenation-
  *     closed (concatenated gzip members form one valid gzip stream per
  *     RFC 1952 §2.2; jsonl is newline-framed), so the fold is pure I/O:
  *     no decode, no re-serialize, read-back rows byte-identical.
  *     Scheduling is the ski-rental rule, REUSING the measured
  *     [[graft.streaming.SelfIndexCompaction.shouldCompact]] decision via
  *     [[SinkCompaction]].
  *   - '''Retention''' ([[retainByCount]] / [[retainByAge]]): delete
  *     whole expired segments (append-ordered — segment names embed the
  *     epoch, so name order IS arrival order for one query's stream).
  *   - '''Takedown purge''' ([[purgeWarcRecords]]): rewrite ONLY the
  *     segments holding affected records, dropping those records and
  *     keeping every other member's bytes verbatim — the storage half of
  *     deletion propagation, composing with
  *     [[graft.dedup.Dedup.reElectAfterDeletion]] (pq97): purge the
  *     bytes here, re-elect the dedup clusters there.
  *
  * Tailing-reader contract (documented, spec-pinned): compaction/
  * retention remove files — a tailing `graft-warc`/`graft-jsonl` stream
  * that has FULLY CONSUMED them treats the disappearance as routine
  * rotation (`retireConsumed`); folding or expiring segments a consumer
  * has NOT finished is data loss and strict mode raises, by design. The
  * compacted file is a NEW file to a running stream, so its records
  * RE-DELIVER once (at-least-once across a compaction) — run compaction
  * behind the same watermark as retention, or point the downstream at
  * the engine's streaming dedup; batch/table readers just see fewer
  * files. Purge rewrites a file in place (atomic rename), which changes
  * later records' byte positions — rebuild any
  * [[graft.sources.warc.WarcIndex]] rows for rewritten files.
  */
object SegmentMaintenance {

  /** Committed segments of `dir` with the medium's suffix, in HISTORY
    * order: compacted-history files first (they hold the oldest records
    * by construction), then everything else by (mtime, name). Name order
    * alone is NOT arrival order for batch-written segments (`seg-b<uuid>`
    * tags are random and would sort before `seg-compact-`), so retention
    * and folding key on modification time with the name as the
    * within-second tiebreak — exact for streaming epoch tags, arrival-
    * true for batch tags.
    */
  def segments(dir: String, suffix: String): Seq[File] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("seg-") && f.getName.endsWith(suffix))
      .sortBy(f => (if (f.getName.startsWith("seg-compact-")) 0 else 1,
        f.lastModified(), f.getName)).toSeq

  /** Fold all but the newest `keepRecent` segments into one compacted
    * segment (`seg-compact-<k>-<fingerprint>.<suffix>`; [[segments]]
    * classes compact files FIRST — history before tail — regardless of
    * their fresh mtime). No-op below `minSegments`. Byte concatenation + write-to-temp
    * + atomic rename + source deletion; a crash before the rename leaves
    * only a `.inprogress` temp (swept by the next run), a crash between
    * rename and deletes leaves duplicates a re-run folds again.
    * Returns the compacted segment name if a fold ran.
    */
  def compactSegments(
      dir: String,
      suffix: String,
      keepRecent: Int = 2,
      minSegments: Int = 4): Option[String] = {
    require(keepRecent >= 0 && minSegments >= 2, s"bad bounds ($keepRecent, $minSegments)")
    val segs = segments(dir, suffix)
    if (segs.size < math.max(minSegments, keepRecent + 2)) return None
    val fold = segs.dropRight(keepRecent)
    // fingerprint of the folded names: deterministic, collision-safe across
    // repeated folds (a re-run after a partial fold hashes different names)
    val md = java.security.MessageDigest.getInstance("MD5")
    fold.foreach(f => md.update(f.getName.getBytes("UTF-8")))
    val fp = md.digest().take(4).map("%02x".format(_)).mkString
    val k = segments(dir, suffix).count(_.getName.startsWith("seg-compact-"))
    val name = f"seg-compact-$k%04d-$fp$suffix"
    val tmp = new File(dir, s".$name.${java.util.UUID.randomUUID()}.inprogress")
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(tmp), 1 << 20)
    try fold.foreach { f =>
      val in = new java.io.FileInputStream(f)
      try {
        val buf = new Array[Byte](1 << 20)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    } finally out.close()
    java.nio.file.Files.move(tmp.toPath, new File(dir, name).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    fold.foreach(_.delete())
    Some(name)
  }

  /** Keep the newest `keep` segments, delete the rest (compacted history
    * counts as one segment). Returns the deleted names.
    */
  def retainByCount(dir: String, suffix: String, keep: Int): Seq[String] = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val victims = segments(dir, suffix).dropRight(keep)
    victims.foreach(_.delete())
    victims.map(_.getName)
  }

  /** Delete segments whose mtime is older than `maxAgeMillis` before
    * `nowMillis` (injected — determinism and testability). Returns the
    * deleted names.
    */
  def retainByAge(dir: String, suffix: String, maxAgeMillis: Long, nowMillis: Long): Seq[String] = {
    require(maxAgeMillis >= 0, s"maxAge must be >= 0")
    val victims = segments(dir, suffix)
      .filter(f => nowMillis - f.lastModified() > maxAgeMillis)
    victims.foreach(_.delete())
    victims.map(_.getName)
  }

  /** Takedown purge over a `graft-warc` segment directory: rewrite only
    * the segments that hold records whose `WARC-Target-URI` is in
    * `takedownUris`, dropping those records. Unaffected segments are not
    * touched (byte-identical, mtime preserved); within a rewritten gz
    * segment, members holding only surviving records copy VERBATIM (their
    * compressed bytes, not a re-compression) — only a multi-record member
    * with a partial hit re-serializes its survivors. A framed-but-corrupt
    * member (CRC/ISIZE mismatch) is stepped over by its exact size so
    * takedowns AFTER it still purge; a takedown record INSIDE such a
    * member is unreachable by construction — for the reader too (both
    * skip it by the same rule), so no readable copy survives — and stays
    * as corrupt bytes until compaction or retention drops the segment.
    * Distributed: one task per affected file (the takedown set
    * broadcasts). Returns the number of records removed.
    */
  def purgeWarcRecords(
      spark: SparkSession,
      dir: String,
      takedownUris: Seq[String],
      maxRecordBytes: Long = 1L << 30): Long = {
    if (takedownUris.isEmpty) return 0L
    val uris = takedownUris.toSet
    // find affected files with ONE header-only scan (column pruning keeps
    // block bytes unread)
    val affected = spark.read.format("graft-warc").option("path", dir).load()
      .select("file", "target_uri")
      .where(org.apache.spark.sql.functions.col("target_uri")
        .isin(takedownUris: _*))
      .select("file").distinct()
      .collect().map(_.getString(0)).toSeq
    if (affected.isEmpty) return 0L
    val urisB = spark.sparkContext.broadcast(uris)
    val dirB = dir
    val removed = spark.sparkContext.parallelize(affected, affected.size).map { name =>
      purgeOneWarcFile(new File(dirB, name), urisB.value, maxRecordBytes)
    }.sum().toLong
    removed
  }

  /** Rewrite one WARC segment without the takedown records. Returns the
    * count removed. Package-visible for the spec.
    */
  private[graft] def purgeOneWarcFile(
      f: File, uris: Set[String], maxRecordBytes: Long): Long = {
    import graft.sources.warc.GraftWarc
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val gz = GraftWarc.isGz(f.getName)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var removed = 0L
    var p = 0
    if (gz) {
      while (p < bytes.length) {
        GraftWarc.gzipMember(bytes, p, bytes.length - p, maxOut = maxRecordBytes) match {
          case GraftWarc.MemberOk(size, plain) =>
            val recs = memberRecords(plain)
            val (hit, kept) = recs.partition(r => uris.contains(r._1))
            if (hit.isEmpty) out.write(bytes, p, size.toInt) // verbatim copy
            else {
              removed += hit.size
              if (kept.nonEmpty) {
                // partial hit: re-serialize the survivors as one member
                // (close() ends the native deflater; closing the BAOS
                // underneath is a no-op)
                val gzOut = new java.util.zip.GZIPOutputStream(out, 64 * 1024)
                kept.foreach(r => gzOut.write(r._2))
                gzOut.close()
              }
            }
            p += size.toInt
          case GraftWarc.MemberCorrupt(size, _) =>
            // framed-but-corrupt (CRC/ISIZE mismatch, over-bound inflate):
            // the SIZE is known, so STEP OVER it and keep purging — the
            // reader skips such members the same way, and stopping here
            // would silently leave later takedown records in the file
            out.write(bytes, p, size.toInt)
            p += size.toInt
          case _ => // malformed/incomplete tail: preserve it untouched
            out.write(bytes, p, bytes.length - p)
            p = bytes.length
        }
      }
    } else {
      while (p < bytes.length) {
        GraftWarc.parseHead(bytes, p, bytes.length) match {
          case GraftWarc.HeadOk(h)
              if p + h.headBytes + h.contentLength + 4 <= bytes.length =>
            val size = (h.headBytes + h.contentLength + 4).toInt
            if (h.header("warc-target-uri").exists(uris.contains)) removed += 1
            else out.write(bytes, p, size)
            p += size
          case _ =>
            out.write(bytes, p, bytes.length - p)
            p = bytes.length
        }
      }
    }
    if (removed > 0) {
      val tmp = new File(f.getParentFile, s".${f.getName}.${java.util.UUID.randomUUID()}.inprogress")
      java.nio.file.Files.write(tmp.toPath, out.toByteArray)
      java.nio.file.Files.move(tmp.toPath, f.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    removed
  }

  /** (target-uri, full record bytes) of every record in a decompressed
    * member — the bytes slice back VERBATIM so survivors re-serialize
    * byte-identically.
    */
  private def memberRecords(plain: Array[Byte]): Seq[(String, Array[Byte])] = {
    import graft.sources.warc.GraftWarc
    val out = Seq.newBuilder[(String, Array[Byte])]
    var p = 0
    var done = false
    while (!done && p < plain.length) {
      GraftWarc.parseHead(plain, p, plain.length) match {
        case GraftWarc.HeadOk(h)
            if p + h.headBytes + h.contentLength + 4 <= plain.length =>
          val size = (h.headBytes + h.contentLength + 4).toInt
          out += ((h.header("warc-target-uri").orNull,
            java.util.Arrays.copyOfRange(plain, p, p + size)))
          p += size
        case _ => done = true
      }
    }
    out.result()
  }
}

/** The rent-or-buy scheduler for sink-segment compaction — the SAME
  * 2-competitive ski-rental decision as
  * [[graft.streaming.SelfIndexCompaction]] (whose pure
  * `shouldCompact(k, totalMb, debt)` this reuses), pointed at a document
  * sink directory: per epoch, accrue the per-segment probe rent from the
  * LISTING (no data I/O), fold when rent covers the fold price.
  */
final class SinkCompaction(
    perSegmentProbeSec: Double,
    foldSecPerMb: Double,
    minSegments: Int = 4,
    keepRecent: Int = 2) extends Serializable {

  private val decision =
    new graft.streaming.SelfIndexCompaction(perSegmentProbeSec, foldSecPerMb, minSegments)
  private var debtSec = 0.0
  private val fired = scala.collection.mutable.ArrayBuffer.empty[Long]

  /** Epochs at which a fold ran — for audits/specs. */
  def firedAt: Seq[Long] = fired.toSeq

  /** Accrue one epoch's rent and fold when the rule fires. Call from the
    * stream's epoch/batch listener (the SelfIndexCompaction wiring).
    */
  def afterEpoch(dir: String, suffix: String, epochId: Long): Boolean = {
    val segs = SegmentMaintenance.segments(dir, suffix)
    val k = segs.size
    val totalMb = segs.map(_.length()).sum / 1048576.0
    debtSec += math.max(k - 1, 0) * perSegmentProbeSec
    if (decision.shouldCompact(k, totalMb, debtSec) &&
      SegmentMaintenance.compactSegments(dir, suffix, keepRecent, minSegments).isDefined) {
      debtSec = 0.0
      fired += epochId
      true
    } else false
  }
}
