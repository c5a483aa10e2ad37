package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentiles

/** Equivalence oracle for the distributed two-pass rank-selection
  * percentile: must be bit-identical to Spark's `percentile` aggregate
  * (which buffers a per-group value map and is the scale-weak form it
  * replaces) across groups, percentile positions, tie regimes, and the
  * degenerate single-row / extreme-p cases.
  */
class PercentilesSpec extends SparkTestBase {
  import spark.implicits._

  private def builtin(df: org.apache.spark.sql.DataFrame, g: String, v: String,
      ps: Seq[Double]) =
    df.groupBy(col(g).as("g"))
      .agg(array(ps.map(p => expr(s"percentile($v, $p)")): _*).as("exp"))

  private def ours(df: org.apache.spark.sql.DataFrame, g: String, v: String,
      ps: Seq[Double]) =
    Percentiles.exactGroupPercentiles(df, col(g), col(v), ps)
      .groupBy(col("g"))
      .agg(array(ps.map(p => max(when(col("p") === p, col("pct")))): _*).as("got"))

  test("matches the percentile aggregate bit-for-bit on events") {
    val e = Tables.events(spark, sfDir)
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val diff = ours(e, "event_type", "value", ps)
      .join(builtin(e, "event_type", "value", ps), "g")
      .filter(not(col("got") === col("exp")))
    assert(diff.isEmpty, s"diverged: ${diff.collect().mkString(", ")}")
  }

  test("degenerate groups: single row, all-equal values, heavy ties, nulls") {
    val rows = Seq(
      ("solo", Some(42.0)),
      ("flat", Some(7.0)), ("flat", Some(7.0)), ("flat", Some(7.0)),
      ("ties", Some(1.0)), ("ties", Some(1.0)), ("ties", Some(2.0)),
      ("ties", Some(2.0)), ("ties", Some(9.0)),
      ("null", Some(3.0)), ("null", None), ("null", Some(5.0)),
      ("neg", Some(-1500.5)), ("neg", Some(-0.25)), ("neg", Some(2048.0)))
    val df = rows.toDF("g0", "v0")
    val ps = Seq(0.0, 0.5, 0.75, 1.0)
    val diff = ours(df, "g0", "v0", ps)
      .join(builtin(df, "g0", "v0", ps), "g")
      .filter(not(col("got") === col("exp")))
    assert(diff.isEmpty, s"diverged: ${diff.collect().mkString(", ")}")
  }

  test("an ALL-null group yields the builtin's (g, p, 0, null) — no omission, no extra scan") {
    val df = Seq(
      ("live", Some(1.0)), ("live", Some(3.0)),
      ("dead", Option.empty[Double]), ("dead", Option.empty[Double]))
      .toDF("g0", "v0")
    val ps = Seq(0.0, 0.5, 1.0)
    val got = Percentiles.exactGroupPercentiles(df, col("g0"), col("v0"), ps)
    val dead = got.filter(col("g") === "dead").collect()
    assert(dead.length == ps.size, s"one row per p expected, got ${dead.length}")
    dead.foreach { r =>
      assert(r.getLong(2) == 0L && r.isNullAt(3),
        s"all-null group must report n=0, pct=null (builtin contract): $r")
    }
    // and the builtin agrees
    val b = df.groupBy(col("g0")).agg(expr("percentile(v0, 0.5)").as("exp"))
      .filter(col("g0") === "dead").collect()
    assert(b.head.isNullAt(1))
    // live groups unaffected
    assert(got.filter(col("g") === "live" && col("p") === 0.5)
      .select("pct").as[Double].head() == 2.0)
  }

  test("non-finite values keep the builtin's sort order (NaN greatest, not bucket 0)") {
    // floor(NaN/w) casts to range 0, planting NaN mid-order while every sort
    // treats it as the LARGEST double — caught in the round-14 review; the
    // explicit top-bucket route must agree with the builtin on mixed
    // finite/Inf/NaN groups (equality on NaN result cells via <=>)
    val rows = Seq(
      ("nan", Double.NaN), ("nan", 2.0), ("nan", 3.0),
      ("inf", Double.PositiveInfinity), ("inf", 1.0), ("inf", Double.NegativeInfinity),
      ("both", Double.NaN), ("both", Double.PositiveInfinity),
      ("both", -5.0), ("both", 5.0), ("both", 1e308), ("both", -1e308))
      .toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 1.0)
    val diff = ours(rows, "g", "v", ps)
      .join(builtin(rows, "g", "v", ps), "g")
      .filter(not(col("got") <=> col("exp")))
    assert(diff.isEmpty, s"non-finite order diverged: ${diff.collect().mkString(", ")}")
  }

  test("pinned divergence: -0.0 merges with 0.0 (numerically equal to the builtin, sign bit may differ)") {
    val df = Seq(("z", -0.0), ("z", 0.0), ("z", 1.0)).toDF("g0", "v0")
    // p=0 selects the minimum: the builtin's boxed map keeps -0.0 distinct
    // and returns it; the groupBy key normalization here merges the two
    // zeros, so the answer is +0.0 — same number, different sign bit. This
    // is THE deliberate divergence of the operator; everything else above
    // is bit-for-bit.
    val ours0 = Percentiles.exactGroupPercentiles(df, col("g0"), col("v0"), Seq(0.0))
      .select("pct").as[Double].head()
    val builtin0 = df.groupBy(col("g0"))
      .agg(expr("percentile(v0, 0.0)").as("exp")).select("exp").as[Double].head()
    assert(ours0 == builtin0, "the two answers must be numerically equal")
    assert(java.lang.Double.doubleToRawLongBits(ours0) == 0L,
      "merged zeros normalize to +0.0")
    // the distinct-count collapse is visible in n: 3 raw values, 2 distinct
    // after the merge still count n=3 rows
    val n = Percentiles.exactGroupPercentiles(df, col("g0"), col("v0"), Seq(0.5))
      .select("n").as[Long].head()
    assert(n == 3L, "the merge collapses VALUES, never row counts")
  }

  test("approx twin stays inside its rank-error band vs the exact form, at a fraction of the plan") {
    val e = Tables.events(spark, sfDir)
    val ps = Seq(0.1, 0.5, 0.9)
    val acc = 1000
    val exact = Percentiles.exactGroupPercentiles(e, col("event_type"), col("value"), ps)
      .select(col("g"), col("p"), col("pct").as("pct_exact"))
    val approx = Percentiles.approxGroupPercentiles(
      e, col("event_type"), col("value"), ps, accuracy = acc)
    // GK guarantee is on RANK, not value: for each (g, p) the approximate
    // answer's rank must lie within n/accuracy of the target rank. Verify
    // by counting values <= answer within the group.
    val vals = e.select(col("event_type").as("g"), col("value").cast("double").as("v"))
      .filter(col("v").isNotNull)
    val checked = approx.join(vals, "g")
      .groupBy(col("g"), col("p"), col("n"), col("pct"))
      .agg(count(when(col("v") < col("pct"), 1)).as("rank_lo"),
        count(when(col("v") <= col("pct"), 1)).as("rank_hi"))
      .withColumn("target", (col("n") - 1).cast("double") * col("p"))
      .withColumn("band", col("n").cast("double") / acc + 1)
      // the answer is a real data value occupying 0-based ranks
      // [rank_lo, rank_hi-1]; the GK bound allows the target to miss that
      // span by at most n/accuracy
      .filter(col("target") < col("rank_lo").cast("double") - col("band") ||
        col("target") > (col("rank_hi") - 1).cast("double") + col("band"))
    assert(checked.isEmpty,
      s"approx percentile outside rank band: ${checked.collect().take(5).mkString(", ")}")
    // and it must be the CHEAP plan: one aggregation, no second-pass joins
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
      "approx path must be a single aggregation, no prefix-sum machinery")
    // sanity: both forms produce one row per (group, p)
    assert(approx.count() == exact.count())
  }

  test("plan has no percentile buffer and both prefix-sum sides broadcast") {
    val e = Tables.events(spark, sfDir)
    val plan = Percentiles.exactGroupPercentiles(
      e, col("event_type"), col("value"), Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("), "builtin percentile crept back in")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "bases/targets should broadcast, not shuffle the counts table")
  }
}
