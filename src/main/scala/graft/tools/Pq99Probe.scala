package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution probe for pq99's bimodal reps (r19 verdict: committed
  * window 0.39/0.43/0.33 s, driver window 1.38/1.98/1.18 s on identical
  * code, box counters clean in both). Two measurements, one JSON line:
  *
  *   1. an in-JVM A/B of the decode mechanism — the OLD gzip shape (a
  *      `GZIPInputStream` whose success path never called `close()`, so
  *      every row's native zlib window waited for the Cleaner) vs the
  *      NEW shape (`GraftWarc.gzipMember` over a thread-local reused
  *      `Inflater`) — in a tight loop at pq99's per-rep decode count,
  *      with GC count/time and allocated-byte deltas per side. The old
  *      shape's cost is cleaner-thread-dependent: when the Cleaner keeps
  *      up the loop is fast, when it backlogs (native windows pile up,
  *      `malloc` slows, GC runs to drive reference processing) the same
  *      loop runs multiples slower — the bimodality, reproduced on demand
  *      by varying heap pressure;
  *   2. N full pq99 reps through the registered query with per-rep GC
  *      ms, JIT compilation ms, and allocated MB beside the wall time —
  *      the same fingerprint Bench now emits — showing the new shape's
  *      reps are unimodal.
  *
  * Usage: runMain graft.tools.Pq99Probe [sfDir] [reps]
  */
object Pq99Probe {

  /** The r19 decode shape, kept verbatim for the A/B: never closes the
    * stream on the success path — one Cleaner-freed native Inflater per
    * call.
    */
  private def oldGunzip(body: Array[Byte], maxOut: Long): Array[Byte] = {
    if (body.length < 18) return null
    val out = new java.io.ByteArrayOutputStream(math.min(body.length * 4L, 1L << 16).toInt.max(64))
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(body), 64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) {
        if (out.size().toLong + n > maxOut) return null
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case _: java.io.IOException => null }
  }

  private def jitMs(): Long = {
    val b = java.lang.management.ManagementFactory.getCompilationMXBean
    if (b != null && b.isCompilationTimeMonitoringSupported) b.getTotalCompilationTime else 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- 1. mechanism A/B: same member, pq99's decode count, driver-side
    val payload = ("pack my box with five dozen liquor jugs — " * 500).getBytes("UTF-8")
    val member = {
      val out = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(out); gz.write(payload); gz.close()
      out.toByteArray
    }
    val decodes = 16000 // pq99 at sf0.1: 4000 gzip rows x 4 output columns
    def loop(dec: (Array[Byte], Long) => Array[Byte]): (Double, Long, Long, Long) = {
      val (gc0, gcMs0) = graft.BenchMetrics.gcSnapshot()
      val alloc0 = graft.BenchMetrics.allocatedBytes()
      val t0 = System.nanoTime()
      var i = 0
      while (i < decodes) {
        val r = dec(member, 1L << 26)
        require(r.length == payload.length)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      val (gc1, gcMs1) = graft.BenchMetrics.gcSnapshot()
      (sec, gc1 - gc0, gcMs1 - gcMs0,
        (graft.BenchMetrics.allocatedBytes() - alloc0) / (1024 * 1024))
    }
    // warm both paths, then interleave 3 reps each so neither side owns a
    // JIT or heap-state advantage
    loop(oldGunzip); loop(graft.plans.HttpDecode.gunzip)
    val oldReps = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long, Long)]
    val newReps = scala.collection.mutable.ArrayBuffer.empty[(Double, Long, Long, Long)]
    for (_ <- 1 to 3) {
      oldReps += loop(oldGunzip)
      newReps += loop(graft.plans.HttpDecode.gunzip)
    }

    // --- 2. full pq99 reps with the Bench fingerprint
    val fn = graft.SparkEntry.queries("pq99_http_text")
    fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
    val qReps = (1 to reps).map { _ =>
      val (gc0, gcMs0) = graft.BenchMetrics.gcSnapshot()
      val alloc0 = graft.BenchMetrics.allocatedBytes()
      val jit0 = jitMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val (gc1, gcMs1) = graft.BenchMetrics.gcSnapshot()
      (sec, gc1 - gc0, gcMs1 - gcMs0, jitMs() - jit0,
        (graft.BenchMetrics.allocatedBytes() - alloc0) / (1024 * 1024))
    }

    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def secs(xs: Seq[(Double, Long, Long, Long)]): String =
      xs.map(x => num(x._1)).mkString("[", ",", "]")
    val json =
      s"""{"probe":"pq99_bimodality","decodes_per_loop":$decodes,""" +
      s""""old_gzipinputstream_sec":${secs(oldReps.toSeq)},""" +
      s""""old_gc_ms":${oldReps.map(_._3).mkString("[", ",", "]")},""" +
      s""""old_alloc_mb":${oldReps.map(_._4).mkString("[", ",", "]")},""" +
      s""""new_gzipmember_sec":${secs(newReps.toSeq)},""" +
      s""""new_gc_ms":${newReps.map(_._3).mkString("[", ",", "]")},""" +
      s""""new_alloc_mb":${newReps.map(_._4).mkString("[", ",", "]")},""" +
      s""""pq99_rep_sec":${qReps.map(x => num(x._1)).mkString("[", ",", "]")},""" +
      s""""pq99_rep_gc_ms":${qReps.map(_._3).mkString("[", ",", "]")},""" +
      s""""pq99_rep_jit_ms":${qReps.map(_._4).mkString("[", ",", "]")},""" +
      s""""pq99_rep_alloc_mb":${qReps.map(_._5).mkString("[", ",", "]")},""" +
      s""""sf":"$sfDir"}"""
    println(json)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("tools/pq99_probe_r20.json"), json + "\n")
    catch { case e: Throwable => System.err.println(s"[probe] write failed: $e") }
    spark.stop()
  }
}
