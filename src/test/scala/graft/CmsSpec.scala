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

  test("portable plain-update sketch: partition-invariant cells, upper bound holds") {
    val e = Tables.events(spark, sfDir)
    def sk(df: org.apache.spark.sql.DataFrame) =
      df.agg(cms_sketch(graft.functions.key_bytes(col("user_id")), 2048, 4,
        conservative = false, portable = true).as("s"))
    // plain updates sum-merge exactly: the serialized sketch is byte-identical
    // under any repartitioning (what makes dq09 externally oracle-able);
    // conservative update can NOT promise this — cells depend on arrival order
    val a = sk(e).select(md5(col("s"))).head().getString(0)
    val b = sk(e.repartition(13)).select(md5(col("s"))).head().getString(0)
    assert(a == b, "portable plain-update sketch must be partition-invariant")
    val exact = e.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val bad = exact.crossJoin(sk(e))
      .filter(cms_estimate(col("s"), graft.functions.key_bytes(col("user_id")),
        portable = true) < col("n"))
      .count()
    assert(bad == 0L)
  }

  test("cell-join estimates equal per-row cms_estimate exactly") {
    val e = Tables.events(spark, sfDir)
    val sketches = PerKeyQuota.windowedSketch(e, col("user_id"), col("ts"), "1 day",
      width = 2048, depth = 4, conservative = false, portable = true)
    val exact = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
    val viaJoin = PerKeyQuota.estimatesPortableByCellJoin(
        sketches, exact, col("key"), width = 2048, depth = 4)
      .select(col("win.start").cast("long"), col("key"), col("est_n"))
      .as[(Long, Long, Long)].collect().toSet
    val viaRow = exact.join(broadcast(sketches), "win")
      .select(col("win.start").cast("long"), col("key"),
        graft.functions.cms_estimate(col("sketch"),
          graft.functions.key_bytes(col("key")), portable = true))
      .as[(Long, Long, Long)].collect().toSet
    assert(viaJoin == viaRow,
      "cell-join estimates must be value-identical to the per-row scalar form")
    assert(viaJoin.nonEmpty)
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

  test("salted two-level merge holds the upper bound at the production size (65536x12)") {
    // the reference's quota budget: width 65536 x depth 12 (~6 MB serialized,
    // PerKeyQuotaManager.java:36-51). The two-level salted merge exists FOR
    // this size — M x 6 MB partials funneling into one reducer per window is
    // the hot spot the salt fans out. Assert the full-size path end to end:
    // merged estimates still upper-bound every exact (key, window) count.
    val e = Tables.events(spark, sfDir).repartition(16)
    val salted = PerKeyQuota.windowedSketchSalted(
      e, col("user_id"), col("ts"), "1 day", salts = 4, width = 65536, depth = 12)
    val ex = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
    val joined = ex.join(broadcast(salted), "win")
      .select(col("n"),
        cms_estimate(col("sketch"), graft.functions.key_bytes(col("key"))).as("est"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) >= r.getLong(0),
      s"est ${r.getLong(1)} < exact ${r.getLong(0)} at production size"))
    // at width 65536 and this SF's N, collisions are essentially nil —
    // estimates should be EXACT for nearly all keys (sanity that the wide
    // sketch is actually the one consulted, not a narrow default)
    val inflated = joined.count(r => r.getLong(1) > r.getLong(0))
    assert(inflated.toDouble / joined.length <= 0.01,
      s"$inflated/${joined.length} keys inflated at width 65536 — wrong width in play?")
  }

  test("repartitioned backfill form upper-bounds and builds buffers only after the row shuffle") {
    val e = Tables.events(spark, sfDir)
    val rep = PerKeyQuota.windowedSketchRepartitioned(
      e, col("user_id"), col("ts"), "1 day", salts = 4, width = 1024, depth = 4)
    // same guarantee class as the partial forms: estimates upper-bound exact
    val ex = PerKeyQuota.windowedRatesExact(e, col("user_id"), col("ts"), "1 day")
    val bad = ex.join(broadcast(rep), "win")
      .filter(cms_estimate(col("sketch"), graft.functions.key_bytes(col("key"))) < col("n"))
      .count()
    assert(bad == 0L, "repartitioned sketch lost the CMS upper bound")
    // plan shape: the row repartition on (win, salt) must satisfy the
    // aggregation's distribution — no THIRD exchange between the row shuffle
    // and the sketch agg (that's the whole point: buffers are built only
    // where their group lives)
    val plan = rep.queryExecution.executedPlan.toString()
    assert("Exchange".r.findAllIn(plan).size == 2,
      s"expected exactly two exchanges (row repartition, then final merge):\n$plan")
  }

  test("salted merge bounds reducer fan-in: one sketch partial per (window, salt)") {
    val e = Tables.events(spark, sfDir)
    val salted = PerKeyQuota.windowedSketchSalted(
      e, col("user_id"), col("ts"), "1 day", salts = 4, width = 1024, depth = 4)
    val plan = salted.queryExecution.executedPlan.toString()
    // two aggregation levels = two exchanges: (win, salt) then (win); the
    // first-level reducers each merge only M/salts partials
    assert("Exchange".r.findAllIn(plan).size == 2,
      s"expected exactly two exchanges (salted then final merge):\n$plan")
    assert(plan.contains("__salt"), s"first-level key should include the salt:\n$plan")
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
