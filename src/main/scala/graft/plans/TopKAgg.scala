package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact bounded-heap top-k: keep the `k` largest (score, id) pairs under
  * the total order (score DESC, id ASC). The per-partition buffer is
  * O(k); partial heaps merge map-side. This is what makes a per-group
  * top-k scale: the Window form (`row_number` over `partitionBy(group)`)
  * shuffles and sorts EVERY scored candidate row, while the aggregate's
  * exchange carries at most partitions×groups×k fixed-width rows — at a
  * 100 TB corpus with a broadcast query batch, the difference between
  * shuffling the corpus's scores and shuffling kilobytes. Exactness: the
  * kept set under a total order is associative/commutative across any
  * partitioning, so the result is identical to the Window form row for
  * row (asserted in CurationOpsSpec).
  */
object TopKByScore {

  /** Head = the entry top-k would evict first (smallest score, largest id). */
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  final class Buf {
    val pq = new mutable.PriorityQueue[(Double, Long)]()(worstFirst)
  }

  def update(buf: Buf, score: Double, id: Long, k: Int): Unit =
    // NaN (e.g. cosine against a zero-norm vector) is excluded outright: the
    // IEEE comparison below would never evict a NaN head, so one NaN entry
    // would otherwise block every later insertion into that partial heap.
    if (score.isNaN) ()
    else if (buf.pq.size < k) buf.pq.enqueue((score, id))
    else {
      val (hs, hi) = buf.pq.head
      if (score > hs || (score == hs && id < hi)) {
        buf.pq.dequeue()
        buf.pq.enqueue((score, id))
      }
    }

  def merge(a: Buf, b: Buf, k: Int): Buf = {
    b.pq.foreach { case (s, i) => update(a, s, i, k) }
    a
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.pq.size * 16)
    bb.putInt(buf.pq.size)
    buf.pq.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) { buf.pq.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }
}

/** Aggregate `top_k_by(score, id, k)` → array<struct<id, score>> ordered by
  * (score desc, id asc); rows with a null or NaN score, or a null id, are
  * ignored.
  */
case class TopKByScoreAgg(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Buf] with BinaryLike[Expression] {

  require(k > 0, s"k=$k must be positive")

  override def createAggregationBuffer(): TopKByScore.Buf = new TopKByScore.Buf

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    val s = left.eval(input)
    val i = right.eval(input)
    if (s != null && i != null)
      TopKByScore.update(buf, s.asInstanceOf[Double], i.asInstanceOf[Long], k)
    buf
  }

  override def merge(a: TopKByScore.Buf, b: TopKByScore.Buf): TopKByScore.Buf =
    TopKByScore.merge(a, b, k)

  override def eval(buf: TopKByScore.Buf): Any = {
    val rows = buf.pq.toSeq
      .sortBy { case (s, i) => (-s, i) }
      .map { case (s, i) => InternalRow(i, s) }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = TopKByScore.serialize(buf)
  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = TopKByScore.deserialize(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScoreAgg =
    copy(left = newLeft, right = newRight)
}

/** Aggregate `capped_collect_longs(v, cap)` → array<long> | null: collect up
  * to `cap` longs; the moment a group exceeds the cap the buffer COLLAPSES
  * to an overflow marker and the result is null. This is the bounded form
  * of `collect_list` for DF-cutoff posting lists: a collect-then-filter
  * materializes a stop-gram's FULL posting array (f ids for a gram in f
  * docs — unbounded) in one aggregation buffer just to discard it, and a
  * count-first pre-pass costs an extra gram-table shuffle; this buffer is
  * O(cap) per group per partition, merges map-side, and overflowed groups
  * carry 1 bit. Element order is partition-dependent (callers must be
  * order-insensitive — pair explosion and size counts are); null inputs are
  * ignored.
  */
case class CappedCollectLongsAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectLongsAgg.Buf]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(cap > 0, s"cap=$cap must be positive")

  import CappedCollectLongsAgg.Buf

  override def createAggregationBuffer(): Buf = new Buf

  private def add(buf: Buf, v: Long): Unit =
    if (!buf.over) {
      buf.ids += v
      if (buf.ids.size > cap) { buf.over = true; buf.ids.clear() }
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    if (b.over) { a.over = true; a.ids.clear() }
    else b.ids.foreach(add(a, _))
    a
  }

  override def eval(buf: Buf): Any =
    if (buf.over) null else new GenericArrayData(buf.ids.toArray[Any])

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + buf.ids.size * 8)
    bb.put(if (buf.over) 1.toByte else 0.toByte)
    bb.putInt(buf.ids.size)
    buf.ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buf
    buf.over = bb.get() == 1
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.ids += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "capped_collect_longs"

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLongsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLongsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CappedCollectLongsAgg =
    copy(child = newChild)
}

object CappedCollectLongsAgg {
  final class Buf {
    var over: Boolean = false
    val ids: mutable.ArrayBuffer[Long] = mutable.ArrayBuffer.empty[Long]
  }
}

/** Aggregate `hll_sketch(h, m)` over 60-bit portable hashes →
  * `struct(zero_regs int, harmonic bigint, est bigint)` — the single-pass
  * aggregate form of [[graft.quality.CorpusStats.hllDistinct]]'s relational
  * register pipeline, OUTPUT-IDENTICAL by construction: the buffer is the
  * dense m-register array (`M_j = max rho`), `harmonic` is the same exact
  * integer `Σ_pop 2^(width+1-M_j) + zero_regs·2^(width+1)` (dyadic terms —
  * no float error, no order dependence), and `est` replays the identical
  * literal-double arithmetic `(α_m · m²·2^(width+1)) / harmonic` in the
  * same association order. What the single-agg form buys: ONE stateful
  * aggregation instead of two chained group-bys, which is what Structured
  * Streaming's windowed aggregation needs — the m-byte buffer rides the
  * state store per (window, group) and merges by element max.
  *
  * Null inputs are ignored (null keys carry no distinct-count signal, the
  * hllRegisters rule). Inputs MUST be 60-bit non-negative hashes
  * ([[graft.functions.TextFunctions.portable_hash]]); rho is computed from
  * the high `60 - log2(m)` bits exactly as the relational form.
  */
case class HllSketchAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(m >= 16 && (m & (m - 1)) == 0 && m <= 65536,
    s"m=$m: register count must be a power of two in [16, 65536]")

  private val bits = java.lang.Integer.numberOfTrailingZeros(m)
  private val width = 60 - bits

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val j = (h & (m - 1)).toInt
      val w = h >>> bits
      // rho = 1-based position of the leftmost 1-bit in the width-bit
      // suffix; width+1 when all zeros — bitlen(w) = 64 - nlz(w), so this
      // equals the relational `width+1 - length(bin(w))` exactly
      val rho =
        if (w == 0L) width + 1
        else width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte // rho <= width+1 <= 57: fits a byte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var populated = 0
    var hpop = 0L
    var i = 0
    while (i < m) {
      val mj = buf(i)
      if (mj > 0) { populated += 1; hpop += 1L << (width + 1 - mj) }
      i += 1
    }
    val zeroRegs = m - populated
    val harmonic = hpop + zeroRegs.toLong * (1L << (width + 1))
    // EXACTLY hllDistinct's literal arithmetic and association order —
    // alpha tabulated below m=128 (Flajolet et al. §4), asymptotic above;
    // the only float ops are literal-constant arithmetic and one
    // double/int64 division, IEEE-identical across engines
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m.toDouble)
    }
    val scale = (m.toDouble * m.toDouble) * math.pow(2.0, (width + 1).toDouble)
    val est = math.floor(alpha * scale / harmonic.toDouble).toLong
    InternalRow(zeroRegs, harmonic, est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = StructType(Seq(
    StructField("zero_regs", IntegerType, nullable = false),
    StructField("harmonic", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Aggregate `bottom_k_distinct(v, k)` → array<long>: the `k` SMALLEST
  * DISTINCT long values, ascending — the KMV ("k minimum values")
  * distinct-value sketch buffer (Bar-Yossef et al. 2002). Distinctness is
  * the point: duplicates of a kept hash must not evict other hashes, so a
  * plain bounded heap is wrong and the buffer is an ordered set capped at
  * `k`. O(k) per partition, partial buffers merge map-side — the exchange
  * carries at most partitions×groups×k longs no matter the corpus size,
  * which is what lets per-group distinct-set comparisons (union/intersect/
  * Jaccard between KMV sketches) run at 100 TB without the exact
  * distinct-key shuffle. Null inputs are ignored.
  */
case class BottomKDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k > 0, s"k=$k must be positive")

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) { buf += v }
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bottom_k_distinct"

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKDistinctAgg =
    copy(child = newChild)
}
