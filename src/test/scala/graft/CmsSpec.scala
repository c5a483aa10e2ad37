package graft

import org.apache.spark.sql.functions._

import graft.functions.{cms_estimate, cms_sketch}
import graft.operators.PerKeyQuota

class CmsSpec extends SparkTestBase {
  import spark.implicits._

  test("CMS estimate is an upper bound of the exact count") {
    val e = Tables.events(spark, sfDir)
    val sketch = e.agg(cms_sketch(graft.functions.key_bytes(col("user_id")), 4096, 6).as("s"))
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val rows = exact.crossJoin(sketch)
      .select(col("user_id"), col("n"),
        cms_estimate(col("s"), graft.functions.key_bytes(col("user_id"))).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"user ${r.get(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
  }

  test("CMS error is within additive eps*N at the reference's width regime") {
    val e = Tables.events(spark, sfDir)
    val n = e.count()
    val sketch = e.agg(cms_sketch(graft.functions.key_bytes(col("user_id")), 4096, 6).as("s"))
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val maxErr = exact.crossJoin(sketch)
      .select((cms_estimate(col("s"), graft.functions.key_bytes(col("user_id"))) - col("n")).as("err"))
      .agg(max(col("err"))).as[Long].head()
    // classic CMS bound: err <= (2/width) * N with prob 1 - (1/2)^depth;
    // conservative update does strictly better. Allow the full bound.
    assert(maxErr <= math.max(1L, 2L * n / 4096), s"max error $maxErr too large for N=$n")
  }

  test("sketch merge across partitions still upper-bounds (distributed agg)") {
    val e = Tables.events(spark, sfDir).repartition(8)
    val sketch = e.agg(cms_sketch(graft.functions.key_bytes(col("user_id")), 1024, 4).as("s"))
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val bad = exact.crossJoin(sketch)
      .filter(cms_estimate(col("s"), graft.functions.key_bytes(col("user_id"))) < col("n"))
      .count()
    assert(bad == 0L)
  }

  test("salted two-level merge equals the single-level sketch exactly") {
    val e = Tables.events(spark, sfDir)
    val plain = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day", 1024, 4)
    val salted = PerKeyQuota.windowedSketchSalted(e, col("user_id"), col("ts"), "1 day", salts = 7, 1024, 4)
    // conservative update is order-sensitive inside one sketch, so cell-level
    // equality is not expected — but both must upper-bound the exact counts,
    // and the salted form must never exceed the plain form's guarantee class.
    val ex = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
    Seq(plain, salted).foreach { sk =>
      val bad = ex.join(broadcast(sk), "win")
        .filter(cms_estimate(col("sketch"), graft.functions.key_bytes(col("key"))) < col("n"))
        .count()
      assert(bad == 0L)
    }
  }

  test("windowed sketch plan has no exchange before the partial aggregate") {
    val e = Tables.events(spark, sfDir)
    val sk = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day", 1024, 4)
    val plan = sk.queryExecution.executedPlan.toString()
    // partial ObjectHashAggregate must sit below the single exchange: the
    // round-1 repartition(win) put an exchange FIRST, collapsing parallelism
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0, s"expected the agg shuffle:\n$plan")
    assert(plan.indexOf("ObjectHashAggregate", exchangeIdx) >= 0,
      s"expected a partial aggregate below the exchange:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one exchange (the agg shuffle):\n$plan")
  }

  test("windowed sketch path agrees with exact rates within bound") {
    val e = Tables.events(spark, sfDir)
    val sk = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day", 4096, 6)
    val ex = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
    val joined = ex.join(broadcast(sk), "win")
      .select(col("n"), cms_estimate(col("sketch"), graft.functions.key_bytes(col("key"))).as("est"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(0)))
  }
}
