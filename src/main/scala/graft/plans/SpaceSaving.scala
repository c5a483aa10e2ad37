package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams", ICDT'05):
  * at most `capacity` counters; an unseen item evicts the current minimum
  * and inherits its count as its error bound. Guarantees, with N = stream
  * length and m = capacity:
  *   - est(k) >= true(k) (never undercounts),
  *   - est(k) - true(k) <= err(k) <= N/m,
  *   - every item with true(k) > N/m is present in the summary.
  *
  * Distributed form: per-partition summaries merge by summing counts (and
  * errors) over the key union, then trimming back to `capacity` — the
  * "Mergeable Summaries" construction (Agarwal et al., PODS'12), which
  * preserves the N/m bound for the COMBINED stream length. The buffer is
  * O(capacity) regardless of row count — the sketch tier for "top terms
  * over 100 TB" where an exact groupBy would shuffle the whole vocabulary;
  * the exact query (pq32) stays the ground truth at test scale.
  *
  * Determinism note: when counters tie, which one an eviction removes
  * depends on map order, so under eviction pressure the summary is only
  * guaranteed up to the ε-bounds (SpaceSavingSpec asserts them). With
  * capacity >= distinct-key count no eviction ever happens and the result
  * is EXACT — which is how the registered query stays hash-checkable.
  */
object SpaceSaving {
  /** entry: term -> [count, error] */
  type Buf = mutable.LinkedHashMap[UTF8String, Array[Long]]

  def update(buf: Buf, item: UTF8String, capacity: Int): Unit = {
    buf.get(item) match {
      case Some(ce) => ce(0) += 1
      case None =>
        if (buf.size < capacity) {
          buf.put(item.clone(), Array(1L, 0L))
        } else {
          // evict the minimum-count entry; the newcomer inherits its count
          var minKey: UTF8String = null
          var minCount = Long.MaxValue
          buf.foreach { case (k, ce) =>
            if (ce(0) < minCount) { minCount = ce(0); minKey = k }
          }
          buf.remove(minKey)
          buf.put(item.clone(), Array(minCount + 1, minCount))
        }
    }
  }

  def merge(a: Buf, b: Buf, capacity: Int): Buf = {
    // Mergeable-summaries rule: a key ABSENT from a full summary may have
    // been evicted after absorbing up to that summary's minimum counter, so
    // the merge credits absentees min(summary) — count AND error — or the
    // never-undercount guarantee breaks (a key heavy in partition 1 but
    // evicted in partition 2 would lose partition 2's observations).
    def minOf(s: Buf): Long =
      if (s.size >= capacity) s.valuesIterator.map(_(0)).min else 0L
    val minA = minOf(a)
    val minB = minOf(b)
    val out = new Buf
    a.foreach { case (k, ae) =>
      b.get(k) match {
        case Some(be) => out.put(k, Array(ae(0) + be(0), ae(1) + be(1)))
        case None     => out.put(k, Array(ae(0) + minB, ae(1) + minB))
      }
    }
    b.foreach { case (k, be) =>
      if (!a.contains(k)) out.put(k, Array(be(0) + minA, be(1) + minA))
    }
    val trimmed =
      if (out.size <= capacity) out.toSeq
      // keep the top `capacity` by count (term tiebreak so the trim itself
      // is deterministic)
      else out.toSeq.sortBy { case (k, ce) => (-ce(0), k.toString) }.take(capacity)
    a.clear()
    trimmed.foreach { case (k, ce) => a.put(k, ce) }
    a
  }

  def serialize(buf: Buf): Array[Byte] = {
    val entries = buf.toSeq.map { case (k, ce) => (k.getBytes, ce(0), ce(1)) }
    val size = 4 + entries.map(e => 4 + e._1.length + 16).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c, e) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf
    var i = 0
    while (i < n) {
      val kl = bb.getInt
      val kb = new Array[Byte](kl)
      bb.get(kb)
      buf.put(UTF8String.fromBytes(kb), Array(bb.getLong, bb.getLong))
      i += 1
    }
    buf
  }
}

/** Aggregate `space_saving(term, capacity)` → array<struct<term, est, err>>
  * sorted by (est desc, term asc) for a deterministic output order.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Buf] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity=$capacity must be positive")

  override def createAggregationBuffer(): SpaceSaving.Buf = new SpaceSaving.Buf

  override def update(buf: SpaceSaving.Buf, input: InternalRow): SpaceSaving.Buf = {
    val v = child.eval(input)
    if (v != null) SpaceSaving.update(buf, v.asInstanceOf[UTF8String], capacity)
    buf
  }

  override def merge(a: SpaceSaving.Buf, b: SpaceSaving.Buf): SpaceSaving.Buf =
    SpaceSaving.merge(a, b, capacity)

  override def eval(buf: SpaceSaving.Buf): Any = {
    val rows = buf.toSeq
      .sortBy { case (k, ce) => (-ce(0), k.toString) }
      .map { case (k, ce) =>
        InternalRow(k.clone(), ce(0), ce(1))
      }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSaving.Buf): Array[Byte] = SpaceSaving.serialize(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buf = SpaceSaving.deserialize(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "space_saving"

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingAgg =
    copy(child = newChild)
}
