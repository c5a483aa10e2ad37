package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout — multi-dimensional clustering for scan
  * pruning, the `OPTIMIZE ZORDER BY` capability of modern lakehouse layers
  * (public technique: Morton 1966; Delta/Iceberg both implement it).
  *
  * Why it matters at 100 TB: parquet prunes row groups and files by
  * column MIN/MAX statistics, but a table sorted by one column has random
  * min/max on every other — a filter on the second column scans
  * everything. Interleaving the bits of k normalized columns into one
  * sort key makes every file a small k-dimensional box, so a selective
  * filter on ANY of the k columns skips most files (each dimension keeps
  * ~bits/k of its ordering in the key prefix).
  *
  * Everything here is pure integer Column algebra (shifts/masks/ors —
  * codegen'd, deterministic, oracle-replayable): no UDF, no sampling, no
  * driver state. The write path is `repartitionByRange(zvalue)` +
  * `sortWithinPartitions`, i.e. plain Spark machinery.
  */
object ZOrder {

  /** Map an integral column with KNOWN domain `[min, max]` onto a
    * `bits`-bit rank: `floor((c - min) * 2^bits / (max - min + 1))`,
    * clamped into range (values outside the declared domain saturate
    * rather than wrap). Column `/` is DOUBLE division, so the quotient is
    * taken exactly: subtract `pmod` first — the numerator becomes an exact
    * multiple and the division exact, provided the product stays inside
    * the double mantissa (`(max - min + 1) * 2^bits ≤ 2^52`, enforced; a
    * 32-bit domain at 20 rank bits fits).
    */
  def rankBits(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 20, s"bits=$bits out of range")
    val range = max - min + 1
    require(range > 0 && range <= (1L << 52) / (1L << bits),
      s"domain [$min,$max] too wide for $bits bits of exact-division headroom")
    val num = (c.cast("long") - min) * (1L << bits)
    val scaled = ((num - pmod(num, lit(range))) / range).cast("long")
    greatest(least(scaled, lit((1L << bits) - 1)), lit(0L))
  }

  /** Interleave the bits of `cols` (each already a non-negative rank of
    * `bits` bits, e.g. from [[rankBits]]) into the Morton key: output bit
    * `j*n + k` = bit `j` of column `k`. Total `bits * n ≤ 62`.
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"z-order interleave takes 2-4 columns, got $n")
    require(bits * n <= 62, s"$n cols x $bits bits exceeds LONG")
    cols.zipWithIndex.map { case (c, k) =>
      (0 until bits).map { j =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + k)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** The composed z-value over (column, min, max) triples. */
  def zValue(dims: Seq[(Column, Long, Long)], bits: Int): Column =
    interleaveBits(dims.map { case (c, lo, hi) => rankBits(c, lo, hi, bits) },
      bits)

  /** Write `df` z-ordered by `zCol` into `numFiles` range-partitioned,
    * internally-sorted parquet files: each file covers one contiguous
    * z-range = one small k-dimensional box, so its per-column MIN/MAX
    * footer stats are tight and selective filters on any dimension prune
    * at file granularity. (Range boundaries come from Spark's
    * RangePartitioner sample — layout-only, never semantics.)
    */
  def writeZOrdered(
      df: DataFrame,
      zCol: Column,
      path: String,
      numFiles: Int): Unit =
    df.withColumn("__z", zCol)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
