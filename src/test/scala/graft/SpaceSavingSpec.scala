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

  test("windowed heavy hitters run inside streaming state (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = in.toDF().toDF("ts", "term")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(graft.functions.space_saving(col("term"), 64).as("hh"))
      .select(col("w.start").as("wstart"), explode(col("hh")).as("e"))
      .select(col("wstart"), col("e.term"), col("e.est"))
      .writeStream.format("memory").queryName("hh_windows")
      .outputMode("complete").start()
    val t0 = 1704067200000L
    def row(min: Int, term: String) = (new java.sql.Timestamp(t0 + min * 60000L), term)
    // two windows; data arrives across several batches so sketch state
    // must survive (serialize/deserialize through) the state store
    in.addData(Seq(row(1, "a"), row(2, "a"), row(3, "b"), row(12, "c")))
    q.processAllAvailable()
    in.addData(Seq(row(4, "a"), row(5, "b"), row(13, "c"), row(14, "d")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("hh_windows").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2))).toSet
    val w0 = t0 // minute 0 window start
    val w1 = t0 + 10 * 60000L
    assert(got === Set(
      (w0, "a", 3L), (w0, "b", 2L),
      (w1, "c", 2L), (w1, "d", 1L)),
      s"windowed sketch state diverged: $got")
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
