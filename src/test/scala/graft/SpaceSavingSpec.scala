package graft

import scala.util.Random

import org.apache.spark.sql.functions._

/** SpaceSaving invariants under real eviction pressure (the registered
  * query pq33 never evicts — capacity exceeds the corpus vocabulary — so
  * the ε-bound regime is proven here on synthetic zipf-ish streams):
  *   - never undercounts: est >= true for every reported term;
  *   - bounded overcount: est - true <= err <= N/capacity;
  *   - guaranteed heavy hitters: every item with true > N/capacity appears.
  * The stream is spread over many partitions so the partial-summary merge
  * path (the distributed part) is what is actually under test.
  */
class SpaceSavingSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new Random(42L)

  test("eviction-regime bounds hold across a multi-partition merge") {
    val capacity = 32
    // zipf-ish: rank r drawn with weight ~ 1/r over a vocab far beyond capacity
    val vocab = 500
    val n = 20000
    val items = Seq.fill(n) {
      val r = math.min(vocab - 1, (math.exp(rnd.nextDouble() * math.log(vocab)) - 1).toInt)
      s"t$r"
    }
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap

    val got = items.toDF("term").repartition(16)
      .agg(graft.functions.space_saving(col("term"), capacity).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    assert(got.length <= capacity, s"summary exceeded capacity: ${got.length}")
    val bound = n.toLong / capacity
    got.foreach { case (term, est, err) =>
      val t = trueCounts.getOrElse(term, 0L)
      assert(est >= t, s"$term undercounted: est $est < true $t")
      assert(est - t <= err, s"$term error bookkeeping broken: est $est true $t err $err")
      assert(err <= bound, s"$term err $err exceeds N/m = $bound")
    }
    val reported = got.map(_._1).toSet
    trueCounts.filter(_._2 > bound).keys.foreach { heavy =>
      assert(reported.contains(heavy), s"guaranteed heavy hitter $heavy missing")
    }
  }

  test("no-eviction regime is exact (capacity >= vocabulary)") {
    val items = Seq.fill(5000)(s"w${rnd.nextInt(20)}")
    val trueCounts = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = items.toDF("term").repartition(8)
      .agg(graft.functions.space_saving(col("term"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(t => t._1 -> t._2).toMap === trueCounts)
    assert(got.forall(_._3 == 0L), "err must be 0 without eviction")
    // deterministic output order: est desc, term asc
    val sorted = got.sortBy(t => (-t._2, t._1)).toSeq
    assert(got.toSeq === sorted)
  }
}
