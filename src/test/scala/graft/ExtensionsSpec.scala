package graft

/** The engine's custom expressions through the pure-SQL surface
  * (GraftExtensions via spark.sql.extensions — see SparkTestBase config).
  */
class ExtensionsSpec extends SparkTestBase {

  test("CMS sketch/estimate/merge work from spark.sql") {
    Tables.events(spark, sfDir).createOrReplaceTempView("ev")
    val rows = spark.sql("""
      WITH sk AS (
        SELECT graft_cms_merge(part) AS s FROM (
          SELECT graft_cms_sketch(cast(cast(user_id AS string) AS binary), 1024, 4) AS part
          FROM ev GROUP BY user_id % 8))
      SELECT e.user_id, count(*) AS n,
             max(graft_cms_estimate(sk.s, cast(cast(e.user_id AS string) AS binary))) AS est
      FROM ev e CROSS JOIN sk GROUP BY e.user_id
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1), s"estimate must upper-bound: $r"))
  }

  test("vector_dot from spark.sql matches the declarative fold") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb")
    val rows = spark.sql("""
      SELECT graft_vector_dot(embedding, embedding) AS d,
             aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)),
                       cast(0.0 AS double), (acc, v) -> acc + v) AS expected
      FROM emb LIMIT 50
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vector_dot_long matches the declarative integer fold, nulls and mismatches included") {
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embl")
    val rows = spark.sql("""
      WITH q AS (SELECT transform(embedding, x -> cast(floor(x * 100) AS bigint)) AS v FROM embl LIMIT 50)
      SELECT graft_vector_dot_long(v, v) AS d,
             aggregate(zip_with(v, v, (x, y) -> x * y), 0L, (acc, e) -> acc + e) AS expected
      FROM q
    """).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // length mismatch and null element → null, exactly like the fold
    val edge = spark.sql("""
      SELECT graft_vector_dot_long(array(1L, 2L), array(1L)) AS mismatch,
             graft_vector_dot_long(array(1L, NULL), array(1L, 2L)) AS withNull
    """).head()
    assert(edge.isNullAt(0) && edge.isNullAt(1))
  }

  test("dt_meta encode/decode roundtrip from spark.sql") {
    val row = spark.sql("""
      SELECT graft_dt_meta_decode(graft_dt_meta_encode(named_struct(
        'timestamp_millis', 123456789L,
        'source_application_id', 'app',
        'source_instance_id', 'i-1',
        'retry_count', 3L,
        'scheduled_time_millis', 987654321L))) AS m
    """).head().getStruct(0)
    assert(row.getLong(0) == 123456789L)
    assert(row.getString(1) == "app")
    assert(row.getLong(3) == 3L)
    assert(row.getLong(4) == 987654321L)
    // malformed bytes decode to null, not an error (poison-record policy)
    assert(spark.sql("SELECT graft_dt_meta_decode(cast('junk+junk' AS binary))").head().isNullAt(0))
  }

  test("text-hash, media-fp, and top-k functions work from spark.sql") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // each SQL form must equal its DataFrame-API twin
    val t = "the quick brown fox jumps over the lazy dog"
    val sqlRow = spark.sql(s"""
      SELECT graft_minhash_sigs('$t', 5, 8) AS mh,
             graft_sim_hash('$t', 16) AS sh,
             graft_word_ngram_hashes('$t', 3) AS ng,
             graft_media_frame_fp('$t') AS fp
    """).head()
    val dfRow = Seq(t).toDF("t").select(
      graft.functions.minhash_sigs(col("t"), 5, 8).as("mh"),
      graft.functions.sim_hash(col("t"), 16).as("sh"),
      graft.functions.word_ngram_hashes(col("t"), 3).as("ng"),
      graft.functions.media_frame_fp(col("t")).as("fp")).head()
    assert(sqlRow.getSeq[Long](0) == dfRow.getSeq[Long](0))
    assert(sqlRow.getLong(1) == dfRow.getLong(1))
    assert(sqlRow.getSeq[Long](2) == dfRow.getSeq[Long](2))
    assert(sqlRow.getLong(3) == dfRow.getLong(3))
    // bounded-heap top-k as a SQL aggregate, int score cast like the wrapper
    val tk = spark.sql("""
      SELECT g, graft_top_k_by(s, id, 2) AS tk FROM VALUES
        ('a', 3, 10L), ('a', 5, 11L), ('a', 4, 12L), ('b', 1, 20L)
        AS t(g, s, id)
      GROUP BY g ORDER BY g
    """).collect()
    assert(tk(0).getSeq[org.apache.spark.sql.Row](1).map(r => r.getLong(0)) == Seq(11L, 12L))
    assert(tk(1).getSeq[org.apache.spark.sql.Row](1).map(r => r.getLong(0)) == Seq(20L))
    // compression ratio + bucket histogram
    val cr = spark.sql(s"SELECT graft_compression_ratio_pm('$t')").head().getLong(0)
    val crDf = Seq(t).toDF("t")
      .select(graft.functions.compression_ratio_pm(col("t"))).head().getLong(0)
    assert(cr == crDf && cr > 0)
    val bh = spark.sql("""
      SELECT graft_bucket_hist(b, 4) FROM VALUES (0L), (1L), (1L), (3L) AS t(b)
    """).head().getSeq[Long](0)
    assert(bh == Seq(1L, 2L, 0L, 1L))
  }

  test("registered functions enforce arity and literal-ness of width/depth") {
    intercept[Exception] {
      spark.sql("SELECT graft_cms_estimate(cast('x' AS binary))").collect()
    }
    intercept[Exception] {
      Tables.events(spark, sfDir).createOrReplaceTempView("ev2")
      spark.sql("SELECT graft_cms_sketch(cast(cast(user_id AS string) AS binary), user_id, 4) FROM ev2").collect()
    }
  }
}
