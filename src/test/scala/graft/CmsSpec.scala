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
