package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout (pq87 family): bit-exact interleave vs a plain-Scala
  * reference, rank normalization pins, and the property the layout exists
  * for — under a box filter on the SECOND dimension, z-ordered files are
  * min/max-prunable where single-column-sorted files are not.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  private def refInterleave(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- 0 until bits; k <- vals.indices)
      z |= ((vals(k) >> j) & 1L) << (j * vals.size + k)
    z
  }

  test(s"interleaveBits == reference over fuzz ranks, 2 and 3 dims [seed=$seed]") {
    val rnd = new Random(seed)
    for (n <- Seq(2, 3)) {
      val bits = if (n == 2) 16 else 10
      val rows = (0 until 500).map { i =>
        (i.toLong, Seq.fill(n)(rnd.nextLong(1L << bits)))
      }
      val df = rows.map { case (i, vs) => (i, vs(0), vs(1), if (n == 3) vs(2) else 0L) }
        .toDF("i", "a", "b", "c")
      val cols = Seq(col("a"), col("b")) ++ (if (n == 3) Seq(col("c")) else Nil)
      val got = df.select(col("i"),
        ZOrder.interleaveBits(cols, bits).as("z")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.foreach { case (i, vs) =>
        assert(got(i) === refInterleave(vs, bits), s"n=$n i=$i vs=$vs")
      }
    }
  }

  test("rankBits: exact on a power-of-two domain, saturates outside it") {
    val r = Seq(0L, 511L, 1023L, -5L, 2000L).toDF("v")
      .select(ZOrder.rankBits(col("v"), 0L, 1023L, 10).as("r"))
      .as[Long].collect()
    assert(r.toSeq === Seq(0L, 511L, 1023L, 0L, 1023L))
    // non-power-of-two domain stays monotone and in range
    val m = (1L to 100L).toDF("v")
      .select(ZOrder.rankBits(col("v"), 1L, 100L, 6).as("r"))
      .as[Long].collect()
    assert(m.toSeq === m.sorted.toSeq && m.head === 0L && m.last === 63L)
  }

  test("z-ordered files are min/max prunable on the second dimension; single-sorted are not") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val Array(okMin, okMax, ckMin, ckMax) =
      o.agg(min("o_orderkey"), max("o_orderkey"),
        min("o_custkey"), max("o_custkey")).head()
        .toSeq.map(_.asInstanceOf[Long]).toArray
    val zv = ZOrder.zValue(
      Seq((col("o_orderkey"), okMin, okMax), (col("o_custkey"), ckMin, ckMax)),
      bits = 10)

    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(o, zv, s"$tmp/z", numFiles = 16)
    // the baseline layout: globally sorted by the FIRST column only
    o.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/sorted")

    // a box filter on the SECOND dimension covering ~1/8 of its domain:
    // count the files whose [min,max] custkey range intersects the box —
    // exactly what parquet footer pruning can skip
    val lo = ckMin + (ckMax - ckMin) / 2
    val hi = lo + (ckMax - ckMin) / 8
    def overlapping(dir: String): Int = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
      assert(files.length === 16, s"expected 16 files in $dir")
      files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("o_custkey"), max("o_custkey")).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
    }
    val zFiles = overlapping(s"$tmp/z")
    val sortedFiles = overlapping(s"$tmp/sorted")
    info(s"files overlapping the custkey box: z-ordered=$zFiles / 16, " +
      s"orderkey-sorted=$sortedFiles / 16")
    // orderkey-sorted files each span ~the whole custkey domain
    assert(sortedFiles >= 14, s"baseline unexpectedly prunable: $sortedFiles")
    // z-ordered files are custkey-boxed: most fall outside the filter
    assert(zFiles * 2 <= sortedFiles,
      s"z-order must at least halve the scannable files ($zFiles vs $sortedFiles)")
    // and both layouts return the same rows
    val expect = o.filter(col("o_custkey").between(lo, hi)).count()
    assert(spark.read.parquet(s"$tmp/z")
      .filter(col("o_custkey").between(lo, hi)).count() === expect)
  }
}
