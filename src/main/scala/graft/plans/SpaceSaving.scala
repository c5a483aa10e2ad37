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

  /** Summary buffer: the (term -> [count, error]) map plus a count-indexed
    * eviction structure — `byCount` maps each live count to the keys holding
    * it, insertion-ordered within a tie. This is the Stream-Summary idea
    * (Metwally §3.1: counters grouped in count buckets, min bucket found
    * without scanning): `update` is O(log #distinct-counts) and eviction
    * reads the min bucket directly, instead of the O(capacity) scan the
    * round-4 version paid on EVERY unseen item under eviction pressure.
    * Zipf streams — the heavy-hitter workload — spend most updates in
    * exactly that path (vocab >> capacity), which made eviction the
    * sketch's hot loop.
    */
  final class Buf {
    // term -> (stableKey, [count, error]). The stableKey is the CLONED
    // UTF8String that also lives in byCount: the input UTF8String handed to
    // update() is backed by a reusable UnsafeRow buffer and must never be
    // retained in either structure (a retained input mutates under the
    // index and silently corrupts the eviction minimum).
    val entries = new mutable.HashMap[UTF8String, (UTF8String, Array[Long])]
    // count -> keys holding it; built LAZILY at the first eviction. The
    // no-eviction regime (capacity >= vocabulary — the exact, hash-checkable
    // mode the registered query runs in) then pays plain HashMap increments
    // and never maintains the index; the eviction regime amortizes one
    // O(m log m) build and keeps every later eviction scan-free.
    val byCount = new mutable.TreeMap[Long, mutable.LinkedHashSet[UTF8String]]
    var indexed = false

    def indexAdd(k: UTF8String, count: Long): Unit =
      if (indexed)
        byCount.getOrElseUpdate(count, new mutable.LinkedHashSet[UTF8String]) += k

    def indexRemove(k: UTF8String, count: Long): Unit =
      if (indexed) {
        val bucket = byCount(count)
        bucket -= k
        if (bucket.isEmpty) byCount.remove(count)
      }

    def buildIndex(): Unit = {
      byCount.clear()
      indexed = true
      entries.valuesIterator.foreach { case (sk, ce) => indexAdd(sk, ce(0)) }
    }

    /** `k` must be an owned (cloned or freshly built) instance. */
    def put(k: UTF8String, ce: Array[Long]): Unit = {
      entries.get(k).foreach { case (sk, old) => indexRemove(sk, old(0)) }
      entries.put(k, (k, ce))
      indexAdd(k, ce(0))
    }

    def size: Int = entries.size
    def minCount: Long =
      if (entries.isEmpty) 0L
      else if (indexed) byCount.firstKey
      else entries.valuesIterator.map(_._2(0)).min
    def toSeq: Seq[(UTF8String, Array[Long])] =
      entries.valuesIterator.toSeq.map { case (sk, ce) => (sk, ce) }
  }

  def update(buf: Buf, item: UTF8String, capacity: Int): Unit = {
    buf.entries.get(item) match {
      case Some((sk, ce)) =>
        buf.indexRemove(sk, ce(0))
        ce(0) += 1
        buf.indexAdd(sk, ce(0))
      case None =>
        if (buf.size < capacity) {
          buf.put(item.clone(), Array(1L, 0L))
        } else {
          // evict a minimum-count entry (min bucket read off the count
          // index, no scan); the newcomer inherits its count as its error
          if (!buf.indexed) buf.buildIndex()
          val minCount = buf.byCount.firstKey
          val victim = buf.byCount(minCount).head
          buf.indexRemove(victim, minCount)
          buf.entries.remove(victim)
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
    def minOf(s: Buf): Long = if (s.size >= capacity) s.minCount else 0L
    val minA = minOf(a)
    val minB = minOf(b)
    val out = new mutable.HashMap[UTF8String, Array[Long]]
    a.entries.foreach { case (k, (_, ae)) =>
      b.entries.get(k) match {
        case Some((_, be)) => out.put(k, Array(ae(0) + be(0), ae(1) + be(1)))
        case None          => out.put(k, Array(ae(0) + minB, ae(1) + minB))
      }
    }
    b.entries.foreach { case (k, (_, be)) =>
      if (!a.entries.contains(k)) out.put(k, Array(be(0) + minA, be(1) + minA))
    }
    val trimmed =
      if (out.size <= capacity) out.toSeq
      // keep the top `capacity` by count (term tiebreak so the trim itself
      // is deterministic)
      else out.toSeq.sortBy { case (k, ce) => (-ce(0), k.toString) }.take(capacity)
    val res = new Buf
    trimmed.foreach { case (k, ce) => res.put(k, ce) }
    res
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
