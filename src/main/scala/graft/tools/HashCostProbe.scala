package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

import graft.Tables

/** Per-row cost breakdown for the native text-hash expressions (VERDICT r3
  * "What's wrong #2" / next-round #5): is md5 itself — pinned by DuckDB-oracle
  * parity to the portable `conv(substring(md5(s), …), 16, 10)` family — the
  * dominant share of [[graft.plans.MinHashSigs]] / [[graft.plans.SimHash]]
  * eval time, or is the remaining loop structure worth generating Java for?
  *
  * Decomposition (driver-side, same UTF8String inputs the expressions see):
  *   minhash: full eval  vs  shingle+dedup+md5 (no k-min loop)  vs
  *            shingle+dedup only (no md5)
  *   simhash: full eval  vs  tokenize+dedup+md5 (no vote loop)  vs
  *            tokenize+dedup only (no md5)
  * The md5 share = (md5pass − structurepass) / full. Codegen can only ever
  * remove the per-row dispatch + boxing (nanoseconds) and none of these
  * passes, so a dominant md5 share closes the item as portability tax.
  *
  * Usage: runMain graft.tools.HashCostProbe [sfDir]
  */
object HashCostProbe {
  private def timeIt[A](reps: Int)(body: => A): Double = {
    body // warm-up
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }.sorted
    times(reps / 2)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]").appName("hash-cost-probe")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts: Array[UTF8String] = Tables.table(spark, dir, "documents")
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    spark.stop()
    println(s"docs=${texts.length} totalChars=${texts.map(_.numChars().toLong).sum}")

    val shingleSize = 5
    val reps = 7

    // --- minhash family ---
    val mh16 = graft.plans.MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), shingleSize, 16)
    val tFull16 = timeIt(reps) { texts.foreach(mh16.nullSafeEval) }
    val mh8 = graft.plans.MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), shingleSize, 8)
    val tFull8 = timeIt(reps) { texts.foreach(mh8.nullSafeEval) }

    val md = MessageDigest.getInstance("MD5")
    // shingle + dedup + md5, no k-min loop
    def md5Pass(text: UTF8String): Long = {
      val last = math.max(text.numChars() - (shingleSize - 1), 1)
      val seen = new java.util.HashSet[UTF8String]()
      var acc = 0L
      var pos = 1
      while (pos <= last) {
        val sh = text.substringSQL(pos, shingleSize)
        if (seen.add(sh)) acc ^= md.digest(sh.getBytes)(0)
        pos += 1
      }
      acc
    }
    // shingle + dedup only
    def shinglePass(text: UTF8String): Long = {
      val last = math.max(text.numChars() - (shingleSize - 1), 1)
      val seen = new java.util.HashSet[UTF8String]()
      var acc = 0L
      var pos = 1
      while (pos <= last) {
        val sh = text.substringSQL(pos, shingleSize)
        if (seen.add(sh)) acc += 1
        pos += 1
      }
      acc
    }
    var sink = 0L
    val tMd5 = timeIt(reps) { texts.foreach(t => sink ^= md5Pass(t)) }
    val tShingle = timeIt(reps) { texts.foreach(t => sink ^= shinglePass(t)) }

    // md5pass/shinglepass intentionally keep the ORIGINAL substringSQL +
    // HashSet structure — they are the legacy decomposition baseline that
    // motivated the byte-range rewrite (and md5pass − shinglepass remains a
    // structure-independent estimate of the pure md5 cost, since the same
    // distinct shingles get digested either way)
    println(f"minhash  k=16 full=${tFull16}%.3fs  k=8 full=${tFull8}%.3fs  " +
      f"legacy-md5pass=${tMd5}%.3fs  legacy-shinglepass=${tShingle}%.3fs")
    println(f"minhash  pure-md5 estimate ${tMd5 - tShingle}%.3fs = " +
      f"${(tMd5 - tShingle) / tFull16 * 100}%.0f%% of k=16 full, " +
      f"${(tMd5 - tShingle) / tFull8 * 100}%.0f%% of k=8 full; " +
      f"legacy structure alone was ${tShingle}%.3fs (${tShingle / tFull16}%.1fx the whole new eval)")

    // --- simhash family ---
    val sh16 = graft.plans.SimHash(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 16)
    val tSimFull = timeIt(reps) { texts.foreach(sh16.nullSafeEval) }
    val space = UTF8String.fromString(" ")
    def simMd5Pass(text: UTF8String): Long = {
      val toks = text.split(space, -1)
      val cache = new java.util.HashMap[UTF8String, java.lang.Long]()
      var acc = 0L
      var t = 0
      while (t < toks.length) {
        val tok = toks(t)
        var h = cache.get(tok)
        if (h == null) {
          h = java.lang.Long.valueOf(md.digest(tok.getBytes)(0).toLong)
          cache.put(tok, h)
        }
        acc ^= h.longValue()
        t += 1
      }
      acc
    }
    def simTokenPass(text: UTF8String): Long = {
      val toks = text.split(space, -1)
      val cache = new java.util.HashMap[UTF8String, java.lang.Long]()
      var acc = 0L
      var t = 0
      while (t < toks.length) {
        val tok = toks(t)
        var h = cache.get(tok)
        if (h == null) { h = java.lang.Long.valueOf(tok.numBytes().toLong); cache.put(tok, h) }
        acc ^= h.longValue()
        t += 1
      }
      acc
    }
    val tSimMd5 = timeIt(reps) { texts.foreach(t => sink ^= simMd5Pass(t)) }
    val tSimTok = timeIt(reps) { texts.foreach(t => sink ^= simTokenPass(t)) }
    println(f"simhash  bits=16 full=${tSimFull}%.3fs  md5pass=${tSimMd5}%.3fs  tokenpass=${tSimTok}%.3fs")
    println(f"simhash  md5 share of full: ${(tSimMd5 - tSimTok) / tSimFull * 100}%.1f%%  " +
      f"(structure ${tSimTok / tSimFull * 100}%.1f%%, vote loop ${(tSimFull - tSimMd5) / tSimFull * 100}%.1f%%)")
    if (sink == 42L) println("(sink)")
  }
}
