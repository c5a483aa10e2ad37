package graft.sources.warc

import java.io.{File, RandomAccessFile}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CDX-style record index over a WARC directory + random-access point
  * fetch — the companion every real WARC archive ships beside its
  * segments (the `(url → file, offset)` lookup that turns "which segment
  * holds this URL's capture?" from a 100 TB scan into one record read).
  *
  * Build: ONE distributed scan of the directory through the `graft-warc`
  * source → `(url_canon, file, pos, sub, record_id, warc_type,
  * content_length, digest)`. The reader's `(file, pos, sub)` is already
  * the exact random-access coordinate (record byte start for plain files,
  * gzip-member byte start for `.gz` — the member decompresses
  * independently, which is WHY the one-record-per-member convention
  * exists). Persist with [[graft.sources.Bucketing.writeBucketed]] on
  * `url_canon` and lookups co-locate with any url-keyed table at zero
  * shuffle.
  *
  * Fetch: [[readRecordAt]] reads ONE record — a bounded head read + one
  * block read (plain), or one member decode (gz) — never a file scan;
  * the returned `bytesRead` makes the claim checkable (WarcIndexSpec
  * asserts fetch I/O ≪ file size). [[fetchMany]] is the distributed form:
  * a frame of coordinates `mapPartitions` over the same single-record
  * reader, one open file handle per (executor, file) run — the random-
  * access join a serving tier runs against the archive.
  */
object WarcIndex {

  /** One fetched record (sub = index within a multi-record gz member). */
  final case class Fetched(
      sub: Int, headers: Map[String, String], content: Array[Byte])

  /** Result of a point read: the record(s) at the coordinate (a gz member
    * can legally hold several) and the exact bytes of file I/O performed.
    */
  final case class FetchResult(records: Seq[Fetched], bytesRead: Long)

  /** Read the single record (plain) or single gzip member (gz) starting at
    * byte `pos` of `path`. Bounded I/O: never reads past the record/member
    * end plus one growth step. Empty result when `pos` does not hold a
    * valid record (stale index / truncated file).
    */
  def readRecordAt(
      path: String,
      pos: Long,
      maxRecordBytes: Long = 1L << 30): FetchResult = {
    val f = new File(path)
    val raf = new RandomAccessFile(f, "r")
    try readRecordAt(raf, GraftWarc.isGz(f.getName), pos, maxRecordBytes)
    finally raf.close()
  }

  /** [[readRecordAt]] over an ALREADY-OPEN handle — the hot-path form
    * [[fetchMany]] uses so a run of same-file coordinates pays ONE open
    * (100k point reads of one segment must not be 100k opens). The caller
    * owns the handle's lifecycle.
    */
  def readRecordAt(
      raf: RandomAccessFile, gz: Boolean, pos: Long, maxRecordBytes: Long): FetchResult = {
    var bytesRead = 0L
    val fileLen = raf.length()
    if (pos < 0 || pos >= fileLen) return FetchResult(Nil, 0L)
    if (gz) {
        // grow a window from the member start until the member frames
        // completely; members are record-sized, so the first read almost
        // always suffices (64 KiB covers typical web records; bigger
        // members pay one ×4 regrow each, never a file scan)
        var want = math.min(64L << 10, fileLen - pos)
        while (true) {
          val buf = new Array[Byte](want.toInt)
          raf.seek(pos)
          raf.readFully(buf)
          bytesRead += want
          GraftWarc.gzipMember(buf, 0, want.toInt, maxOut = maxRecordBytes) match {
            case GraftWarc.MemberOk(_, plain) =>
              return FetchResult(parseRecords(plain), bytesRead)
            case GraftWarc.MemberIncomplete if want < fileLen - pos &&
                want < maxRecordBytes + (64L << 10) =>
              want = math.min(math.min(want * 4, maxRecordBytes + (64L << 10)), fileLen - pos)
            case _ => return FetchResult(Nil, bytesRead)
          }
        }
        FetchResult(Nil, bytesRead) // unreachable
      } else {
        GraftWarc.headAt(raf, pos, fileLen) match {
          case GraftWarc.HeadOk(h) if h.contentLength <= maxRecordBytes &&
              GraftWarc.recordEndOk(raf, pos, h, fileLen) =>
            // headAt read at most one growth ladder; count its final window
            bytesRead += math.min(4096L, fileLen - pos)
            val content = new Array[Byte](h.contentLength.toInt)
            raf.seek(pos + h.headBytes)
            raf.readFully(content)
            bytesRead += h.contentLength + 8 // block + end-check CRLFCRLFs
            FetchResult(Seq(Fetched(0, headerMap(h.headers), content)), bytesRead)
          case _ => FetchResult(Nil, bytesRead)
        }
    }
  }

  private def headerMap(hs: Vector[(String, String)]): Map[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    hs.foreach { case (k, v) => m.put(k, v) }
    m.toMap
  }

  /** Records inside one decompressed gz member (usually exactly one). */
  private def parseRecords(plain: Array[Byte]): Seq[Fetched] = {
    val out = Seq.newBuilder[Fetched]
    var p = 0
    var sub = 0
    var done = false
    while (!done && p < plain.length) {
      GraftWarc.parseHead(plain, p, plain.length) match {
        case GraftWarc.HeadOk(h)
            if p + h.headBytes + h.contentLength + 4 <= plain.length =>
          val start = p + h.headBytes
          out += Fetched(sub, headerMap(h.headers),
            java.util.Arrays.copyOfRange(plain, start, (start + h.contentLength).toInt))
          p += h.headBytes + h.contentLength.toInt + 4
          sub += 1
        case _ => done = true
      }
    }
    out.result()
  }

  /** The index frame: one distributed scan of `dir` through the
    * `graft-warc` source. `includeDigest = false` skips the `content`
    * column entirely — on plain files the reader then SEEKS past every
    * block, so a digest-free index of a 1 GB segment costs only the head
    * bytes.
    */
  def build(
      spark: SparkSession,
      dir: String,
      suffix: Option[String] = None,
      includeDigest: Boolean = true): DataFrame = {
    var r = spark.read.format("graft-warc").option("path", dir)
    suffix.foreach(sfx => r = r.option("suffix", sfx))
    val df = r.load()
    val base = Seq(
      graft.functions.UrlFunctions.url_canonicalize(col("target_uri")).as("url_canon"),
      col("file"), col("pos"), col("sub"), col("record_id"), col("warc_type"),
      col("content_length"))
    // digest folds into the ONE projection over the scan — selecting it
    // afterwards would reference a pruned column
    val cols = if (includeDigest) base :+ md5(col("content")).as("digest") else base
    df.select(cols: _*)
  }

  /** Persist the index as an external bucketed table on `url_canon` —
    * point lookups and url-keyed joins then co-locate with zero shuffle
    * ([[graft.sources.Bucketing]]).
    */
  def writeBucketed(
      index: DataFrame, tableName: String, path: String, buckets: Int): Unit =
    graft.sources.Bucketing.writeBucketed(
      index, tableName, path, buckets, keys = Seq("url_canon"),
      sortCols = Seq("url_canon"))

  /** Distributed point fetch: `coords` carries (file, pos, sub) rows (an
    * index selection); each partition opens each file once per run of
    * consecutive coordinates and reads ONLY the addressed records. Returns
    * (file, pos, sub, target_uri, content).
    */
  def fetchMany(coords: DataFrame, dir: String): DataFrame = {
    val spark = coords.sparkSession
    import spark.implicits._
    val rows = coords.select(col("file"), col("pos"), col("sub").cast("int"))
      .as[(String, Long, Int)]
    rows.mapPartitions { it =>
      // sort the partition's coordinates so one file's fetches run
      // consecutively, then keep ONE handle open per file run — 100k
      // point reads of a segment are 1 open, not 100k (and the OS page
      // cache serves repeated members). Only the fixed-width COORDINATES
      // buffer for the sort; the fetched payloads (up to 1 GiB each)
      // stream through a lazy iterator one at a time — the eager flatMap
      // this replaces buffered every payload in the partition before
      // returning, an executor OOM at serving-tier fan-in.
      var openFile: String = null
      var raf: RandomAccessFile = null
      def handleFor(file: String): RandomAccessFile = {
        if (file != openFile) {
          if (raf != null) { raf.close(); raf = null }
          raf = new RandomAccessFile(new File(dir, file), "r")
          openFile = file
        }
        raf
      }
      // the handle closes on task COMPLETION, not at iterator end — a
      // readRecordAt throw or a downstream limit() that abandons the
      // iterator must not leak the descriptor
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          if (raf != null) { raf.close(); raf = null; openFile = null }
        })
      val sorted = it.toArray.sortBy(c => (c._1, c._2))
      sorted.iterator.flatMap { case (file, pos, sub) =>
        readRecordAt(handleFor(file), GraftWarc.isGz(file), pos, 1L << 30).records
          .filter(_.sub == sub)
          .map(r => (file, pos, sub, r.headers.getOrElse("warc-target-uri", null), r.content))
      }
    }.toDF("file", "pos", "sub", "target_uri", "content")
  }
}
