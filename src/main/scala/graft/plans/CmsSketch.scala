package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Count-Min sketch with conservative update — the per-key frequency
  * estimator behind the reference's per-key quota (SURVEY.md §2.4 A3;
  * reference `processor/.../internal/KeyCounter.java:39-152`: width a power of
  * two used as a bitmask, depth rows, conservative update at :121-130;
  * production budget ε=5e-5, δ=1e-5 ⇒ 65536×12 — `PerKeyQuotaManager.java:36-51`).
  *
  * Distributed-aggregation design, which the single-process reference never
  * needed: each partition builds a conservative-update sketch (update cost
  * O(depth), no contention), and partial sketches merge by element-wise sum.
  * Per-partition cells upper-bound per-partition counts, so their sum
  * upper-bounds the total — the CMS guarantee survives the shuffle. Buffer is
  * `width*depth` longs ⇒ the default 64 KiB×8 sketch costs ~6 MB/partition at
  * depth 12, constant in row count — this is what makes per-key rate
  * accounting feasible at 100 TB where an exact groupBy(key) would shuffle
  * billions of distinct keys.
  */
object CmsSketch {
  val DefaultWidth = 65536 // power of two: hash & (width-1), KeyCounter.java:76-101
  val DefaultDepth = 12

  private val Seed1 = 0x9747b28c
  private val Seed2 = 0x85ebca6b

  /** depth hash slots via double hashing h_i = h1 + i*h2 (mod width). */
  def slots(bytes: Array[Byte], width: Int, depth: Int): Array[Int] = {
    val h1 = Murmur3_x86_32.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed1)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, Seed2)
    val out = new Array[Int](depth)
    var i = 0
    while (i < depth) {
      out(i) = (h1 + i * h2) & (width - 1)
      i += 1
    }
    out
  }

  private val HexUpper = "0123456789ABCDEF".toCharArray

  /** Engine-portable hash family. The key is first hex-encoded (UPPERCASE,
    * matching Spark `hex()` and DuckDB `hex()`), so arbitrary binary keys
    * stay distinct — decoding raw bytes as UTF-8 would collapse every
    * invalid sequence to U+FFFD and systematically conflate non-UTF-8 keys
    * in all depth rows, outside the CMS collision model. One md5 digest
    * yields FIVE 60-bit slots (15-hex-char windows at offsets 0/4/8/12/16
    * of the 32-char digest hex), so depth ≤ 5 costs a single digest per
    * key; row r reads block ⌊r/5⌋ = md5(block + ":" + hex(key)) at window
    * r mod 5. A SQL oracle recomputes every slot with
    * `CAST(('0x'||substr(md5((r//5)||':'||hex(key)), 1+(r%5)*4, 15)) AS
    * BIGINT) % width`. Murmur3 double hashing stays the production default
    * (cheaper per row); this family exists so a sketch's cells can be
    * hash-checked externally.
    */
  def slotsPortable(bytes: Array[Byte], width: Int, depth: Int): Array[Int] = {
    val keyHex = {
      val out = new Array[Char](bytes.length * 2)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        out(2 * i) = HexUpper(b >>> 4)
        out(2 * i + 1) = HexUpper(b & 0xf)
        i += 1
      }
      new String(out)
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](depth)
    var r = 0
    var block = 0
    while (r < depth) {
      val digest = md.digest(s"$block:$keyHex".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      md.reset()
      var wdw = 0
      while (wdw < 5 && r < depth) {
        // the 60-bit value of hex chars [4*wdw, 4*wdw+15) read straight off
        // the digest nibbles — bit-identical to parseLong(substring, 16)
        var h = 0L
        var nib = 4 * wdw
        val end = nib + 15
        while (nib < end) {
          val b = digest(nib >> 1) & 0xff
          h = (h << 4) | (if ((nib & 1) == 0) b >>> 4 else b & 0xf)
          nib += 1
        }
        out(r) = (h % width).toInt
        r += 1
        wdw += 1
      }
      block += 1
    }
    out
  }

  def estimate(cells: Array[Long], bytes: Array[Byte], width: Int, depth: Int): Long = {
    val s = slots(bytes, width, depth)
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = cells(i * width + s(i))
      if (v < est) est = v
      i += 1
    }
    if (est == Long.MaxValue) 0L else est
  }

  def serialize(cells: Array[Long], width: Int, depth: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + cells.length * 8)
    bb.putInt(width).putInt(depth)
    var i = 0
    while (i < cells.length) { bb.putLong(cells(i)); i += 1 }
    bb.array()
  }

  /** Returns (width, depth, cells). */
  def deserialize(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val width = bb.getInt
    val depth = bb.getInt
    val cells = new Array[Long](width * depth)
    var i = 0
    while (i < cells.length) { cells(i) = bb.getLong; i += 1 }
    (width, depth, cells)
  }
}

/** Aggregate function `cms_sketch(keyBytes)` → serialized sketch (BinaryType).
  * TypedImperativeAggregate: mutable long-array buffer per partition, exactly
  * the shape SURVEY.md §4 calls for.
  */
case class CmsSketchAgg(
    child: Expression,
    width: Int = CmsSketch.DefaultWidth,
    depth: Int = CmsSketch.DefaultDepth,
    conservative: Boolean = true,
    portable: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(Integer.bitCount(width) == 1, "CMS width must be a power of two")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](width * depth)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      val s =
        if (portable) CmsSketch.slotsPortable(bytes, width, depth)
        else CmsSketch.slots(bytes, width, depth)
      if (conservative) {
        // conservative update (KeyCounter.java:121-130): raise only the cells
        // below est+1, keeping overestimation minimal.
        var est = Long.MaxValue
        var i = 0
        while (i < depth) {
          val c = buffer(i * width + s(i))
          if (c < est) est = c
          i += 1
        }
        val target = est + 1
        i = 0
        while (i < depth) {
          val idx = i * width + s(i)
          if (buffer(idx) < target) buffer(idx) = target
          i += 1
        }
      } else {
        // plain update: cell = Σ counts of keys hashing there — order- and
        // partition-independent (sum-merge is exact), so the whole sketch is
        // reproducible by an external SQL oracle. Slightly looser estimates
        // than conservative update; same upper-bound guarantee.
        var i = 0
        while (i < depth) {
          buffer(i * width + s(i)) += 1
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += input(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = CmsSketch.serialize(buffer, width, depth)

  /** SHUFFLE format only (partial → merge): a partition's partial sketch is
    * mostly zeros whenever its distinct-key count is far below width·depth
    * — at the production 65536×12 budget a 100k-key window fills ~5% of the
    * 6 MB buffer, so shipping dense partials costs groups × partitions ×
    * 6 MB of pure zeroes. Encode sparsely (negative-width header, then
    * (idx, value) pairs) when that is smaller; the FINAL result (`eval`)
    * stays the dense public format every reader indexes into.
    */
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    var nnz = 0
    var i = 0
    while (i < buffer.length) { if (buffer(i) != 0L) nnz += 1; i += 1 }
    if (nnz.toLong * 12 >= buffer.length.toLong * 8) CmsSketch.serialize(buffer, width, depth)
    else {
      val bb = ByteBuffer.allocate(12 + nnz * 12)
      bb.putInt(-width).putInt(depth).putInt(nnz)
      i = 0
      while (i < buffer.length) {
        if (buffer(i) != 0L) { bb.putInt(i); bb.putLong(buffer(i)) }
        i += 1
      }
      bb.array()
    }
  }
  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(storageFormat)
    val w = bb.getInt
    if (w >= 0) CmsSketch.deserialize(storageFormat)._3
    else {
      val d = bb.getInt
      val nnz = bb.getInt
      val cells = new Array[Long](-w * d)
      var i = 0
      while (i < nnz) { val idx = bb.getInt; cells(idx) = bb.getLong; i += 1 }
      cells
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketchAgg =
    copy(child = newChild)
}

/** Aggregate `cms_merge(sketchBytes)` → element-wise sum of serialized
  * sketches. The buffer stays empty (length 0) until the first input arrives,
  * at which point it adopts that sketch's width×depth — so the function works
  * for any sketch size without pre-declaring it. Mixed sizes in one group are
  * a caller error and fail fast.
  */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  // header (width, depth) is carried in the serialized form; the live buffer
  // keeps it in two extra leading slots so merges can check compatibility
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def absorb(buffer: Array[Long], width: Int, depth: Int, cells: Array[Long]): Array[Long] =
    if (buffer.length == 0) {
      val out = new Array[Long](2 + cells.length)
      out(0) = width
      out(1) = depth
      var i = 0
      while (i < cells.length) { out(2 + i) = cells(i); i += 1 }
      out
    } else {
      require(buffer(0) == width && buffer(1) == depth,
        s"cms_merge: mixed sketch sizes (${buffer(0)}x${buffer(1)} vs ${width}x$depth)")
      var i = 0
      while (i < cells.length) { buffer(2 + i) += cells(i); i += 1 }
      buffer
    }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val (w, d, cells) = CmsSketch.deserialize(v.asInstanceOf[Array[Byte]])
      absorb(buffer, w, d, cells)
    }
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] =
    if (input.length == 0) buffer
    else absorb(buffer, input(0).toInt, input(1).toInt,
      java.util.Arrays.copyOfRange(input, 2, input.length))

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length == 0) null
    else CmsSketch.serialize(
      java.util.Arrays.copyOfRange(buffer, 2, buffer.length), buffer(0).toInt, buffer(1).toInt)

  /** SHUFFLE format (same sparse rule as [[CmsSketchAgg.serialize]]): a
    * partial merge buffer over a low-key-count group is mostly zeros at
    * production width — encode (idx, value) pairs behind a negative-length
    * marker when smaller. Dense form: plain longs (header slots included),
    * first long = width > 0, disjoint from the marker.
    */
  override def serialize(buffer: Array[Long]): Array[Byte] = {
    var nnz = 0
    var i = 2
    while (i < buffer.length) { if (buffer(i) != 0L) nnz += 1; i += 1 }
    if (buffer.length == 0 || nnz.toLong * 12 >= (buffer.length - 2).toLong * 8) {
      val bb = ByteBuffer.allocate(buffer.length * 8)
      i = 0
      while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(24 + nnz * 12)
      bb.putLong(-buffer(0)).putLong(buffer(1)).putLong(nnz.toLong)
      i = 2
      while (i < buffer.length) {
        if (buffer(i) != 0L) { bb.putInt(i - 2); bb.putLong(buffer(i)) }
        i += 1
      }
      bb.array()
    }
  }
  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    if (storageFormat.isEmpty) return Array.emptyLongArray
    val bb = ByteBuffer.wrap(storageFormat)
    val first = bb.getLong
    if (first >= 0) {
      val out = new Array[Long](storageFormat.length / 8)
      out(0) = first
      var i = 1
      while (i < out.length) { out(i) = bb.getLong; i += 1 }
      out
    } else {
      val w = (-first).toInt
      val d = bb.getLong.toInt
      val nnz = bb.getLong.toInt
      val out = new Array[Long](2 + w * d)
      out(0) = w
      out(1) = d
      var i = 0
      while (i < nnz) { val idx = bb.getInt; out(2 + idx) = bb.getLong; i += 1 }
      out
    }
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsMergeAgg =
    copy(child = newChild)
}

/** Scalar `cms_estimate(sketch, keyBytes)` → estimated count (upper bound).
  * `portable = true` probes with [[CmsSketch.slotsPortable]] — must match the
  * family the sketch was built with.
  */
case class CmsEstimate(left: Expression, right: Expression, portable: Boolean = false)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(sketch: Any, key: Any): Any = {
    // read only the `depth` probed cells straight from the serialized bytes:
    // deserializing the full width*depth buffer per row (~6 MB at production
    // size) would dominate runtime and GC on keyed estimate joins
    val bytes = sketch.asInstanceOf[Array[Byte]]
    val bb = ByteBuffer.wrap(bytes)
    val width = bb.getInt(0)
    val depth = bb.getInt(4)
    val kb = key.asInstanceOf[Array[Byte]]
    val s =
      if (portable) CmsSketch.slotsPortable(kb, width, depth)
      else CmsSketch.slots(kb, width, depth)
    var est = Long.MaxValue
    var i = 0
    while (i < depth) {
      val v = bb.getLong(8 + (i.toLong * width + s(i)).toInt * 8)
      if (v < est) est = v
      i += 1
    }
    if (est == Long.MaxValue) 0L else est
  }

  override def prettyName: String = "cms_estimate"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CmsEstimate =
    copy(left = l, right = r)
}

/** Scalar `cms_cells(sketch)` → the width·depth cell values as `array<long>`
  * (row r's cells at indices `[r·width, (r+1)·width)`). The relational
  * window onto a sketch: explode it ONCE per group and per-key estimates
  * become an ordinary (coordinate → min) join — see
  * `PerKeyQuota.estimatesPortableByCellJoin`, which exists because carrying
  * the serialized sketch binary INTO a per-key row stream copies the full
  * width·depth buffer per row (6 MB at the reference's production budget).
  */
case class CmsCells(child: Expression)
    extends UnaryExpression with UnaryLike[Expression] {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(sketch: Any): Any = {
    val (_, _, cells) = CmsSketch.deserialize(sketch.asInstanceOf[Array[Byte]])
    new org.apache.spark.sql.catalyst.util.GenericArrayData(cells)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsCells", this, classOf[CmsCells].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "cms_cells"
  override protected def withNewChildInternal(newChild: Expression): CmsCells =
    copy(child = newChild)
}
