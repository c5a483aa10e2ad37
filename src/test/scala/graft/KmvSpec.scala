package graft

import org.apache.spark.sql.functions._

import graft.quality.CorpusStats

/** KMV bottom-k distinct sketch (pq82): agreement with the window form,
  * distinctness under heavy duplication, partition invariance, Jaccard
  * estimation accuracy, and the SQL-function registration.
  */
class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("bottom_k_distinct equals the k smallest distinct values, any partitioning") {
    val vs = (0 until 5000).map(i => ("g", (i * 2654435761L) % 100000))
    val df = vs.toDF("g", "v").repartition(13)
    val got = df.groupBy("g")
      .agg(graft.functions.bottom_k_distinct(col("v"), 64).as("bk"))
      .select(explode(col("bk")).as("v")).as[Long].collect().toSeq
    val want = vs.map(_._2).distinct.sorted.take(64)
    assert(got == want)
  }

  test("duplicates of a kept value never evict another value") {
    // 10 distinct values, one duplicated 1000x; k=10 must return all 10
    val rows = Seq.fill(1000)(5L) ++ (0L until 10L)
    val df = rows.map(("g", _)).toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(graft.functions.bottom_k_distinct(col("v"), 10).as("bk"))
      .select(explode(col("bk")).as("v")).as[Long].collect().toSeq
    assert(got == (0L until 10L))
  }

  test("kmv jaccard estimate tracks the true jaccard of the underlying sets") {
    // two groups over a 4000-token universe with a known 1/3 jaccard:
    // a = [0, 3000), b = [2000, 5000) -> intersection 1000, union 5000
    val a = (0 until 3000).map(i => ("a", s"tok-$i"))
    val b = (2000 until 5000).map(i => ("b", s"tok-$i"))
    val df = (a ++ b).toDF("g", "k")
    val sk = CorpusStats.kmvSketch(df, col("g"), col("k"), k = 128)
    val row = CorpusStats.kmvJaccard(sk).head()
    assert(row.getAs[Int]("union_k") == 128)
    val est = row.getAs[Long]("jacc_pm") / 1000.0
    val truth = 1000.0 / 5000.0
    // k=128 binomial std err ~ sqrt(p(1-p)/k) ~ 0.035; allow 4 sigma
    assert(math.abs(est - truth) <= 0.15, s"jaccard est $est vs true $truth")
  }

  test("identical groups estimate jaccard 1.0; disjoint groups 0.0") {
    val a = (0 until 500).map(i => ("a", s"same-$i"))
    val b = (0 until 500).map(i => ("b", s"same-$i"))
    val c = (0 until 500).map(i => ("c", s"other-$i"))
    val sk = CorpusStats.kmvSketch((a ++ b ++ c).toDF("g", "k"), col("g"), col("k"), k = 128)
    val out = CorpusStats.kmvJaccard(sk)
      .select("src_a", "src_b", "jacc_pm").as[(String, String, Long)].collect()
      .map { case (x, y, j) => (x, y) -> j }.toMap
    assert(out(("a", "b")) == 1000L)
    assert(out(("a", "c")) == 0L)
    assert(out(("b", "c")) == 0L)
  }

  test("sketch is invariant under repartitioning") {
    val df = (0 until 3000).map(i => (s"g${i % 4}", s"k-$i")).toDF("g", "k")
    val one = CorpusStats.kmvSketch(df, col("g"), col("k"), 128).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val many = CorpusStats.kmvSketch(df.repartition(11), col("g"), col("k"), 128)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(one == many)
  }

  test("sketches built with different k refuse to combine") {
    val df = (0 until 100).map(i => (s"g${i % 2}", s"k-$i")).toDF("g", "k")
    val mixed = CorpusStats.kmvSketch(df.filter(col("g") === "g0"), col("g"), col("k"), k = 64)
      .unionByName(
        CorpusStats.kmvSketch(df.filter(col("g") === "g1"), col("g"), col("k"), k = 128))
    val e = intercept[Exception] { CorpusStats.kmvJaccard(mixed).collect() }
    assert(e.getMessage.contains("different k") ||
      Option(e.getCause).exists(_.getMessage.contains("different k")))
  }

  test("a group whose keys are all null yields an empty sketch and jaccard 0, not NaN") {
    val rows = (0 until 50).map(i => ("a", s"k-$i")) :+ (("b", null: String))
    val sk = CorpusStats.kmvSketch(rows.toDF("g", "k"), col("g"), col("k"), k = 16)
    val row = CorpusStats.kmvJaccard(sk).head()
    assert(row.getAs[Int]("union_k") == 16 && row.getAs[Int]("inter_k") == 0)
    assert(row.getAs[Long]("jacc_pm") == 0L)
  }

  test("graft_bottom_k_distinct is registered as a SQL function") {
    val got = spark.sql(
      "SELECT graft_bottom_k_distinct(v, 3) FROM VALUES (9L), (1L), (1L), (4L), (7L) AS t(v)")
      .head().getSeq[Long](0)
    assert(got == Seq(1L, 4L, 7L))
  }

  test("registered query pq82 emits one row per source pair with bounded counts") {
    val out = SparkEntry.queries("pq82_kmv_source_jaccard")(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).select("source").distinct().count().toInt
    assert(out.length == n * (n - 1) / 2)
    out.foreach { r =>
      val u = r.getAs[Int]("union_k"); val i = r.getAs[Int]("inter_k")
      assert(u > 0 && u <= 128 && i >= 0 && i <= u)
      assert(r.getAs[Long]("jacc_pm") == math.floor(1000.0 * i / u).toLong)
    }
  }
}
