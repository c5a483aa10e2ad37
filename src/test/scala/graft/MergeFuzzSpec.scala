package graft

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{BinaryType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BottomKDistinctAgg, CappedCollectLongsAgg, CmsSketchAgg,
  HllSketchAgg, SpaceSavingAgg, TopKByScoreAgg}
import graft.plans.{CmsSketch, SpaceSaving}

/** Seeded randomized MERGE-INVARIANCE fuzz for the mergeable sketch
  * aggregates — the 100 TB correctness property their specs assert only on
  * fixed splits: Spark may partition a group's rows ARBITRARILY, serialize
  * any partial through the shuffle, and merge partials in any order and
  * association, and the result must equal the single-partition evaluation
  * (exact-mergeable sketches: HLL registers, KMV bottom-k, top-k heaps,
  * capped collect, plain CMS) or stay within the published bounds
  * (order-dependent sketches: conservative CMS, SpaceSaving). Every case
  * here drives the production update/serialize/deserialize/merge/eval
  * methods over a random split tree with random shuffle round-trips.
  *
  * Replay: sbt 'set Test/javaOptions += "-Dgraft.fuzz.seed=<base>"'
  *             "testOnly graft.MergeFuzzSpec"
  */
class MergeFuzzSpec extends AnyFunSuite {

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)

  private def row(v: Any): InternalRow = new GenericInternalRow(Array[Any](v))
  private def row2(a: Any, b: Any): InternalRow = new GenericInternalRow(Array[Any](a, b))

  /** Evaluate `rows` through a random contiguous split, per-segment partial
    * buffers, random serialize→deserialize round-trips (the shuffle), and a
    * random merge order/association — exactly the degrees of freedom Spark's
    * partial aggregation has.
    */
  private def splitMergeEval[B](
      agg: TypedImperativeAggregate[B], rows: IndexedSeq[InternalRow], rnd: Random): Any = {
    val nSeg = 1 + rnd.nextInt(6)
    val cuts = (Vector.fill(nSeg - 1)(rnd.nextInt(rows.size + 1)).sorted :+ rows.size)
      .prepended(0)
    val bufs = mutable.ArrayBuffer.empty[B]
    cuts.sliding(2).foreach { w =>
      var buf = agg.createAggregationBuffer()
      rows.slice(w(0), w(1)).foreach(r => buf = agg.update(buf, r))
      bufs += (if (rnd.nextBoolean()) agg.deserialize(agg.serialize(buf)) else buf)
    }
    while (bufs.size > 1) {
      val donor = bufs.remove(rnd.nextInt(bufs.size))
      val into = rnd.nextInt(bufs.size)
      bufs(into) = agg.merge(bufs(into), donor)
    }
    agg.eval(bufs.head)
  }

  private def sequentialEval[B](
      agg: TypedImperativeAggregate[B], rows: IndexedSeq[InternalRow]): Any = {
    var buf = agg.createAggregationBuffer()
    rows.foreach(r => buf = agg.update(buf, r))
    agg.eval(buf)
  }

  private def longs(a: Any): Seq[Long] =
    a.asInstanceOf[GenericArrayData].array.map(_.asInstanceOf[Long]).toSeq

  // ------------------------------------------------------------------- HLL

  test(s"hll_sketch: any split tree equals the single pass AND the register math (base $seed)") {
    info(s"fuzz seed base: $seed")
    val rnd = new Random(seed)
    (0 until 500).foreach { iter =>
      val m = Seq(16, 64, 256)(rnd.nextInt(3))
      val agg = HllSketchAgg(BoundReference(0, LongType, nullable = true), m)
      val n = rnd.nextInt(300)
      // 60-bit hashes, deliberately clustered so register collisions happen
      val hs = IndexedSeq.fill(n)(rnd.nextLong() & ((1L << 60) - 1) & ~(rnd.nextLong() & 0xFF))
      val rows = hs.map(h => row(h: java.lang.Long)) ++
        Seq.fill(rnd.nextInt(3))(row(null))
      val got = splitMergeEval(agg, rows, rnd).asInstanceOf[InternalRow]
      val want = sequentialEval(agg, rows).asInstanceOf[InternalRow]
      assert(got.getInt(0) == want.getInt(0) && got.getLong(1) == want.getLong(1) &&
          got.getLong(2) == want.getLong(2),
        s"iter $iter: split-merge HLL != sequential")
      // independent register-definition replay
      val bits = java.lang.Integer.numberOfTrailingZeros(m)
      val width = 60 - bits
      val regs = new Array[Int](m)
      hs.foreach { h =>
        val j = (h & (m - 1)).toInt
        val w = h >>> bits
        val rho = if (w == 0L) width + 1 else width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (rho > regs(j)) regs(j) = rho
      }
      val zero = regs.count(_ == 0)
      val harmonic = regs.filter(_ > 0).map(r => 1L << (width + 1 - r)).sum +
        zero.toLong * (1L << (width + 1))
      assert(got.getInt(0) == zero && got.getLong(1) == harmonic,
        s"iter $iter: HLL registers diverge from the definition (m=$m)")
    }
  }

  // ------------------------------------------------------------------- KMV

  test(s"bottom_k_distinct: any split tree equals the exact bottom-k (base $seed)") {
    val rnd = new Random(seed ^ 0xb07L)
    (0 until 500).foreach { iter =>
      val k = 1 + rnd.nextInt(32)
      val agg = BottomKDistinctAgg(BoundReference(0, LongType, nullable = true), k)
      val n = rnd.nextInt(200)
      // small value domain so duplicates are common (the distinctness rule)
      val vs = IndexedSeq.fill(n)(rnd.nextLong(64))
      val rows = vs.map(v => row(v: java.lang.Long)) ++ Seq.fill(rnd.nextInt(3))(row(null))
      val got = longs(splitMergeEval(agg, rows, rnd))
      val want = vs.distinct.sorted.take(k)
      assert(got == want, s"iter $iter: KMV bottom-$k $got != exact $want")
    }
  }

  // ----------------------------------------------------------------- top-k

  test(s"top_k_by: any split tree equals the exact ordered top-k (base $seed)") {
    val rnd = new Random(seed ^ 0x70bdL)
    (0 until 500).foreach { iter =>
      val k = 1 + rnd.nextInt(16)
      val agg = TopKByScoreAgg(
        BoundReference(0, DoubleType, nullable = true),
        BoundReference(1, LongType, nullable = true), k)
      val n = rnd.nextInt(200)
      // coarse scores force ties; ids repeat so equal (score,id) pairs occur
      val pairs = IndexedSeq.fill(n)((rnd.nextInt(8).toDouble, rnd.nextLong(32)))
      val rows: IndexedSeq[InternalRow] = pairs.map { case (s, i) =>
        row2(s: java.lang.Double, i: java.lang.Long)
      } ++ Seq(row2(Double.NaN, 7L: java.lang.Long), row2(null, 1L: java.lang.Long))
      val got = splitMergeEval(agg, rows, rnd).asInstanceOf[GenericArrayData]
        .array.map { r => val ir = r.asInstanceOf[InternalRow]; (ir.getDouble(1), ir.getLong(0)) }
        .toSeq
      val want = pairs.sortBy { case (s, i) => (-s, i) }.take(k).map { case (s, i) => (s, i) }
      assert(got == want, s"iter $iter: top-$k $got != exact $want")
    }
  }

  // -------------------------------------------------------- capped collect

  test(s"capped_collect_longs: split-invariant up to element order (base $seed)") {
    val rnd = new Random(seed ^ 0xcabL)
    (0 until 500).foreach { iter =>
      val cap = 1 + rnd.nextInt(12)
      val agg = CappedCollectLongsAgg(BoundReference(0, LongType, nullable = true), cap)
      // sizes straddle the cap so both regimes (kept, overflowed) are hit
      val n = rnd.nextInt(2 * cap + 4)
      val vs = IndexedSeq.fill(n)(rnd.nextLong(100))
      val rows = vs.map(v => row(v: java.lang.Long)) ++ Seq.fill(rnd.nextInt(3))(row(null))
      val got = splitMergeEval(agg, rows, rnd)
      if (vs.size > cap) assert(got == null,
        s"iter $iter: ${vs.size} > cap $cap must overflow to null, got $got")
      else assert(longs(got).sorted == vs.sorted,
        s"iter $iter: capped collect lost/invented elements")
    }
  }

  // ------------------------------------------------------------------- CMS

  test(s"cms_sketch: plain update is split-EXACT; conservative never undercounts (base $seed)") {
    val rnd = new Random(seed ^ 0xc35L)
    val width = 64
    val depth = 4
    (0 until 300).foreach { iter =>
      val n = rnd.nextInt(300)
      // zipf-ish key stream over a small vocabulary
      val vocab = Array.tabulate(20)(i => s"key-$i".getBytes("UTF-8"))
      val keys = IndexedSeq.fill(n)(vocab(math.min(rnd.nextInt(1 + rnd.nextInt(20)), 19)))
      val rows = keys.map(k => row(k)) ++ Seq.fill(rnd.nextInt(3))(row(null))
      val truth = keys.groupBy(new String(_, "UTF-8")).map { case (k, g) => k -> g.size.toLong }

      // plain (sum-merge): the full cell array is split-order-EXACT —
      // byte-identical sketches no matter the split or merge association
      val plain = CmsSketchAgg(BoundReference(0, BinaryType, nullable = true),
        width, depth, conservative = false)
      val gotP = splitMergeEval(plain, rows, rnd).asInstanceOf[Array[Byte]]
      val wantP = sequentialEval(plain, rows).asInstanceOf[Array[Byte]]
      assert(java.util.Arrays.equals(gotP, wantP), s"iter $iter: plain CMS cells diverge")

      // conservative: order-dependent cells, but the estimate contract
      // (never undercount) must hold under EVERY split/merge interleaving
      val cons = CmsSketchAgg(BoundReference(0, BinaryType, nullable = true),
        width, depth, conservative = true)
      val cells = CmsSketch.deserialize(
        splitMergeEval(cons, rows, rnd).asInstanceOf[Array[Byte]])._3
      truth.foreach { case (k, c) =>
        val est = CmsSketch.estimate(cells, k.getBytes("UTF-8"), width, depth)
        assert(est >= c, s"iter $iter: conservative CMS undercounts '$k': est $est < true $c")
      }
    }
  }

  // ----------------------------------------------------------- SpaceSaving

  test(s"space_saving: merged summaries keep the Metwally bounds (base $seed)") {
    val rnd = new Random(seed ^ 0x55aL)
    (0 until 300).foreach { iter =>
      val capacity = 2 + rnd.nextInt(10)
      val agg = SpaceSavingAgg(BoundReference(0, StringType, nullable = true), capacity)
      val n = 1 + rnd.nextInt(400)
      // zipf-ish: term t picked with weight ~ 1/(t+1), vocab >> capacity so
      // eviction pressure is constant
      val vocabN = capacity * 3
      val terms = IndexedSeq.fill(n) {
        var t = rnd.nextInt(vocabN)
        if (rnd.nextBoolean()) t = rnd.nextInt(1 + t)
        s"t$t"
      }
      val rows = terms.map(t => row(UTF8String.fromString(t))) ++
        Seq.fill(rnd.nextInt(3))(row(null))
      val truth = terms.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
      val out = splitMergeEval(agg, rows, rnd).asInstanceOf[GenericArrayData]
        .array.map { r =>
          val ir = r.asInstanceOf[InternalRow]
          (ir.getUTF8String(0).toString, ir.getLong(1), ir.getLong(2))
        }.toSeq
      assert(out.size <= capacity, s"iter $iter: summary exceeds capacity")
      out.foreach { case (t, est, err) =>
        val tr = truth.getOrElse(t, 0L)
        assert(est >= tr, s"iter $iter: '$t' undercounted: est $est < true $tr")
        assert(est - err <= tr,
          s"iter $iter: '$t' error bound broken: est $est - err $err > true $tr")
      }
      // every heavy hitter (true > N/capacity) must be present
      val present = out.map(_._1).toSet
      truth.filter(_._2 > n.toLong / capacity).keys.foreach { t =>
        assert(present.contains(t),
          s"iter $iter: heavy hitter '$t' (true ${truth(t)}, N=$n, cap=$capacity) missing")
      }
    }
  }
}
