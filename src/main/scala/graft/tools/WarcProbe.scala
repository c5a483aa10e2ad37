package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the `graft-warc` medium: synthesizes a corpus of
  * WARC records (plain and per-record-gzip), then times four read shapes —
  * full plain, header-only plain (column pruning ⇒ the reader SEEKS past
  * every block), full gz, header-only gz (members still inflate for
  * framing) — so the pruning claim is a measured ratio, not prose.
  * Prints one JSON line; not part of the driver contract.
  *
  * Usage: runMain graft.tools.WarcProbe [nRecords] [bodyBytes]
  */
object WarcProbe {
  def main(args: Array[String]): Unit = {
    val nRecords = args.headOption.map(_.toInt).getOrElse(20000)
    val bodyBytes = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dirPlain = Files.createTempDirectory("warc-probe-plain").toString
    val dirGz = Files.createTempDirectory("warc-probe-gz").toString
    val body = ("The quick brown fox jumps over the lazy dog. " * (bodyBytes / 45 + 1))
      .take(bodyBytes).getBytes("UTF-8")
    // integer division: report what is actually written, not the request
    val perFile = math.max(1, nRecords / 8)
    val written = perFile * 8
    (0 until 8).foreach { f =>
      val recs = (0 until perFile).map { i =>
        (Seq("WARC-Type" -> "resource",
          "WARC-Target-URI" -> s"https://site$f.example.com/p/$i",
          "WARC-Date" -> "2026-01-02T03:04:05Z"), body)
      }
      graft.sources.warc.GraftWarc.append(dirPlain, f"p-$f%02d.warc", recs)
      graft.sources.warc.GraftWarc.writeGz(dirGz, f"g-$f%02d.warc.gz", recs)
    }
    val plainBytes = new java.io.File(dirPlain).listFiles().map(_.length()).sum
    val gzBytes = new java.io.File(dirGz).listFiles().map(_.length()).sum

    def timeRead(dir: String, pruned: Boolean): Double = {
      def run(): Long = {
        val df = spark.read.format("graft-warc").option("path", dir).load()
        val q = if (pruned) df.select("target_uri", "content_length") else df
        q.write.format("noop").mode("overwrite").save()
        1L
      }
      run() // warm
      val reps = Seq.fill(3) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      reps.sorted.apply(1)
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val fullPlain = timeRead(dirPlain, pruned = false)
    val headPlain = timeRead(dirPlain, pruned = true)
    val fullGz = timeRead(dirGz, pruned = false)
    val headGz = timeRead(dirGz, pruned = true)
    val mb = plainBytes / 1e6
    println(
      s"""{"probe":"warc-throughput","n_records":$written,"body_bytes":$bodyBytes,""" +
        s""""plain_mb":${num(plainBytes / 1e6)},"gz_mb":${num(gzBytes / 1e6)},""" +
        s""""full_plain_sec":${num(fullPlain)},"full_plain_mb_s":${num(mb / fullPlain)},""" +
        s""""header_only_plain_sec":${num(headPlain)},"prune_speedup_plain":${num(fullPlain / headPlain)},""" +
        s""""full_gz_sec":${num(fullGz)},"full_gz_mb_s_uncompressed":${num(mb / fullGz)},""" +
        s""""header_only_gz_sec":${num(headGz)}}""")
    spark.stop()
  }
}
