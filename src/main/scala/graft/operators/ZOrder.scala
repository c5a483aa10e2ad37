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

  /** Hilbert-curve index of `cols` (each a non-negative `bits`-bit rank,
    * e.g. from [[rankBits]]) — the locality-preserving alternative to
    * [[interleaveBits]] (Morton). Morton's Z jumps across the space at
    * every quadrant boundary, so file boxes along the key are wider than
    * they need to be; the Hilbert curve visits every cell with
    * CONTIGUOUS single-step moves, giving tighter per-file bounding boxes
    * at the same cost model (the LAYOUT probe measures the difference on
    * the same box-filter battery).
    *
    * Algorithm: Skilling's transpose form (John Skilling, "Programming
    * the Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain): the
    * axis→transpose exchange loop, Gray encoding, the parity fold, then
    * the same bit interleave as Morton. Everything is pure integer
    * Column algebra; the per-bit loops run as `aggregate` folds over a
    * `sequence` so the expression tree stays CONSTANT-size (an unrolled
    * form would nest the accumulator tree exponentially), and every
    * shift inside a fold is by a literal — the shift amount is carried
    * through the accumulator (`q >>= 1`, `m *= 2^n`) because dynamic
    * shift-by-column does not exist in the API.
    */
  def hilbertBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2 && n <= 4, s"hilbert takes 2-4 columns, got $n")
    require(bits >= 2 && bits * n <= 62, s"$n cols x $bits bits out of range")
    def f(i: Int) = s"x$i"
    // --- axes -> transpose: for Q = 2^(bits-1) down to 2, per dim:
    // if (X[i] & Q) X[0] ^= Q-1 else swap the low bits of X[0]/X[i]
    val transposed = aggregate(
      sequence(lit(1), lit(bits - 1)),
      struct((cols.zipWithIndex.map { case (c, i) => c.as(f(i)) } :+
        lit(1L << (bits - 1)).as("q")): _*),
      (acc, _) => {
        val q = acc.getField("q")
        val p = q - 1
        var xs: Seq[Column] = (0 until n).map(i => acc.getField(f(i)))
        for (i <- 0 until n) {
          val cond = xs(i).bitwiseAND(q) =!= 0L
          val t = xs(0).bitwiseXOR(xs(i)).bitwiseAND(p)
          val nx0 = when(cond, xs(0).bitwiseXOR(p))
            .otherwise(xs(0).bitwiseXOR(t))
          val nxi = when(cond, xs(i)).otherwise(xs(i).bitwiseXOR(t))
          xs =
            if (i == 0) xs.updated(0, nx0)
            else xs.updated(0, nx0).updated(i, nxi)
        }
        struct((xs.zipWithIndex.map { case (x, i) => x.as(f(i)) } :+
          shiftright(q, 1).as("q")): _*)
      },
      // finish: Gray encode (in-place cumulative X[i] ^= X[i-1]) INSIDE the
      // fold, so the whole transpose tree is evaluated exactly once per row
      // (as a downstream fold's init it would otherwise re-evaluate per
      // reference — measured 3x the write cost at n=2)
      acc => {
        val g = new scala.collection.mutable.ArrayBuffer[Column](n)
        g += acc.getField(f(0))
        for (i <- 1 until n) g += acc.getField(f(i)).bitwiseXOR(g(i - 1))
        struct(g.zipWithIndex.map { case (c, i) => c.as(f(i)) }.toSeq: _*)
      })
    // --- parity fold: t ^= Q-1 wherever X[n-1] has bit Q; X[i] ^= t.
    // The gray-encoded words ride the accumulator so they are evaluated
    // once, not once per step.
    val finals = aggregate(
      sequence(lit(1), lit(bits - 1)),
      struct(lit(0L).as("t"), lit(1L << (bits - 1)).as("q"),
        transposed.as("g")),
      (acc, _) => struct(
        when(acc.getField("g").getField(f(n - 1))
            .bitwiseAND(acc.getField("q")) =!= 0L,
          acc.getField("t").bitwiseXOR(acc.getField("q") - 1))
          .otherwise(acc.getField("t")).as("t"),
        shiftright(acc.getField("q"), 1).as("q"),
        acc.getField("g").as("g")),
      acc => struct((0 until n).map(i =>
        acc.getField("g").getField(f(i))
          .bitwiseXOR(acc.getField("t")).as(f(i))): _*))
    // --- interleave the transposed words, LSB group first: bit j of X[i]
    // lands at index bit j*n + (n-1-i) (X[0] most significant in-group)
    aggregate(
      sequence(lit(1), lit(bits)),
      struct(lit(0L).as("h"), lit(1L).as("m"), finals.as("fx")),
      (acc, _) => struct(
        ((0 until n).map(i =>
          acc.getField("fx").getField(f(i)).bitwiseAND(lit(1L)) *
            acc.getField("m") * lit(1L << (n - 1 - i)))
          .reduce(_ + _) + acc.getField("h")).as("h"),
        (acc.getField("m") * lit(1L << n)).as("m"),
        struct((0 until n).map(i =>
          shiftright(acc.getField("fx").getField(f(i)), 1).as(f(i))): _*)
          .as("fx")),
      acc => acc.getField("h"))
  }

  /** The composed Hilbert value over (column, min, max) triples — the
    * [[zValue]] twin on the Hilbert curve.
    */
  def hilbertValue(dims: Seq[(Column, Long, Long)], bits: Int): Column =
    hilbertBits(
      dims.map { case (c, lo, hi) => rankBits(c, lo, hi, bits) }, bits)

  /** [[hilbertValue]] as a STAGED DataFrame transform — the hot-path form:
    * the per-(bit, dim) exchange steps are unrolled into `withColumns`
    * projections over attribute references with the loop constants (Q,
    * Q-1) baked as literals, so the whole computation runs inside
    * whole-stage codegen with zero interpreted higher-order functions
    * (the Column fold form pays ~15 µs/row of interpreted struct-fold
    * machinery; this form benches ~5× cheaper on the same input — the
    * pq92/LAYOUT write path). The exchange outputs are multiply
    * referenced non-cheap expressions, so CollapseProject keeps each
    * stage and the expression tree stays linear in `bits · n`. Same
    * values as [[hilbertValue]] (ZOrderSpec proves staged ≡ fold ≡ the
    * imperative reference). Adds `outCol`; temp stage columns are
    * dropped.
    */
  def withHilbertValue(
      df: DataFrame,
      dims: Seq[(Column, Long, Long)],
      bits: Int,
      outCol: String): DataFrame = {
    val n = dims.size
    require(n >= 2 && n <= 4, s"hilbert takes 2-4 columns, got $n")
    require(bits >= 2 && bits * n <= 62, s"$n cols x $bits bits out of range")
    def f(i: Int) = s"__hx$i"
    val temps = (0 until n).map(f) :+ "__ht"
    graft.operators.Compaction.requireFreshNames(
      df, temps.map(_ => dims.head._1), temps)
    var d = df.withColumns(
      (0 until n).map(i =>
        f(i) -> rankBits(dims(i)._1, dims(i)._2, dims(i)._3, bits)).toMap)
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        val cond = col(f(i)).bitwiseAND(lit(q)) =!= 0L
        val t = col(f(0)).bitwiseXOR(col(f(i))).bitwiseAND(lit(p))
        val nx0 = when(cond, col(f(0)).bitwiseXOR(lit(p)))
          .otherwise(col(f(0)).bitwiseXOR(t))
        d =
          if (i == 0) d.withColumns(Map(f(0) -> nx0))
          else d.withColumns(Map(
            f(0) -> nx0,
            f(i) -> when(cond, col(f(i))).otherwise(col(f(i)).bitwiseXOR(t))))
      }
      q >>= 1
    }
    // Gray encode: cumulative XOR expressed directly over the attributes
    // (withColumns is simultaneous, so g_i = x_0 ^ ... ^ x_i inline)
    def cum(i: Int): Column =
      if (i == 0) col(f(0)) else col(f(i)).bitwiseXOR(cum(i - 1))
    d = d.withColumns((0 until n).map(i => f(i) -> cum(i)).toMap)
    // parity fold with literal Qs, then finals + interleave in one shot
    val tExpr = (1 until bits).map { s =>
      val qq = 1L << s
      when(col(f(n - 1)).bitwiseAND(lit(qq)) =!= 0L, lit(qq - 1)).otherwise(lit(0L))
    }.reduce(_ bitwiseXOR _)
    d = d.withColumn("__ht", tExpr)
    val h = (for (j <- 0 until bits; i <- 0 until n) yield
      shiftleft(
        shiftright(col(f(i)).bitwiseXOR(col("__ht")), j).bitwiseAND(lit(1L)),
        j * n + (n - 1 - i)))
      .reduce(_ bitwiseOR _)
    d.withColumn(outCol, h).drop(temps: _*)
  }

  /** [[writeZOrdered]] on the Hilbert key: range-partitioned by the
    * Hilbert value, sorted within files — each file covers one contiguous
    * curve segment, whose bounding box is tighter than the Morton
    * segment's (LAYOUT probe).
    */
  def writeHilbertOrdered(
      df: DataFrame,
      hCol: Column,
      path: String,
      numFiles: Int): Unit =
    writeZOrdered(df, hCol, path, numFiles)

  /** [[writeHilbertOrdered]] over (column, min, max) triples using the
    * staged codegen form ([[withHilbertValue]]) — the write path to prefer
    * at scale.
    */
  def writeHilbertOrdered(
      df: DataFrame,
      dims: Seq[(Column, Long, Long)],
      bits: Int,
      path: String,
      numFiles: Int): Unit =
    withHilbertValue(df, dims, bits, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)

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
