package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("asOfJoin: inclusive boundary, backward match, and null when nothing precedes") {
    val left = Seq(
      (1L, "k1", t("2024-01-01 10:00:00")), // before any right row -> null
      (2L, "k1", t("2024-01-01 12:00:00")), // exactly at a right ts -> inclusive match
      (3L, "k1", t("2024-01-01 13:30:00")), // after both right rows -> latest one
      (4L, "k2", t("2024-01-01 12:00:00")), // other key
      (5L, "k3", t("2024-01-01 12:00:00"))  // key with no right rows -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", t("2024-01-01 12:00:00"), 100L),
      ("k1", t("2024-01-01 13:00:00"), 200L),
      ("k2", t("2024-01-01 11:00:00"), 300L)
    ).toDF("rk", "rts", "v")
    val out = TemporalJoins.asOfJoin(
        left, right, col("k"), col("rk"), col("ts"), col("rts"), Seq(col("v")))
      .select(col("id"), col("asof.v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some(100L), 3L -> Some(200L), 4L -> Some(300L), 5L -> None))
  }

  test("asOfJoin: NULL right keys/timestamps never match; NULL-key left rows null-extend") {
    val left = Seq(
      (1L, Some("k1"), t("2024-01-01 12:00:00")),
      (2L, None, t("2024-01-01 12:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      (Some("k1"), Some(t("2024-01-01 10:00:00")), 100L),
      (Some("k1"), None, 99L),  // NULL ts: ts >= NULL is never true in SQL
      (None, Some(t("2024-01-01 11:00:00")), 77L) // NULL key: never equal
    ).toDF("rk", "rts", "v")
    val out = TemporalJoins.asOfJoin(
        left, right, col("k"), col("rk"), col("ts"), col("rts"), Seq(col("v")))
      .select(col("id"), col("asof.v"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(100L), 2L -> None))
  }

  test("asOfJoin: NULL-key left rows bypass the window exchange (no NULL-partition skew)") {
    // 30% of left keys NULL: these rows must not enter the window's hash
    // exchange (they would all land in the single NULL partition and be
    // sorted for nothing — a straggler task at scale)
    val left = spark.range(1000)
      .select(col("id"),
        when(col("id") % 10 < 3, lit(null).cast("string"))
          .otherwise(concat(lit("k"), col("id") % 7)).as("k"),
        timestamp_seconds(col("id") + 1700000000L).as("ts"))
    val right = spark.range(100)
      .select(concat(lit("k"), col("id") % 7).as("rk"),
        timestamp_seconds(col("id") * 10 + 1700000000L).as("rts"),
        (col("id") * 2).as("v"))
    val out = TemporalJoins.asOfJoin(
      left, right, col("k"), col("rk"), col("ts"), col("rts"), Seq(col("v")))
    // correctness: every NULL-key left row survives, null-extended
    val nullRows = out.filter(col("k").isNull)
    assert(nullRows.count() == 300L)
    assert(nullRows.filter(col("asof").isNotNull).count() == 0L)
    assert(out.count() == 1000L)
    // plan: the window's input carries an isnotnull filter on the key — the
    // NULL partition never reaches the sort
    val physical = out.queryExecution.executedPlan.toString()
    val windowIdx = physical.indexOf("Window")
    assert(windowIdx >= 0, s"expected a Window node in:\n$physical")
    assert(physical.substring(windowIdx).contains("isnotnull"),
      s"window input should filter NULL keys:\n$physical")
  }

  test("asOfJoin refuses a left frame that already has an 'asof' column") {
    val left = Seq((1L, "k1", t("2024-01-01 12:00:00"), "x")).toDF("id", "k", "ts", "asof")
    val right = Seq(("k1", t("2024-01-01 10:00:00"), 1L)).toDF("rk", "rts", "v")
    intercept[IllegalArgumentException] {
      TemporalJoins.asOfJoin(left, right, col("k"), col("rk"), col("ts"), col("rts"), Seq(col("v")))
    }
  }

  test("rangeJoin: half-open interval, sub-second boundaries, cross-bucket spans") {
    val left = Seq(
      (1L, "k1", t("2024-01-01 10:00:00")), // == start -> in
      (2L, "k1", t("2024-01-01 11:59:59")), // just inside
      (3L, "k1", t("2024-01-01 12:00:00")), // == end -> out (half-open)
      (4L, "k1", t("2024-01-01 09:59:59")), // before start, same second-bucket region
      (5L, "k2", t("2024-01-01 10:30:00"))  // wrong key
    ).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", t("2024-01-01 10:00:00"), t("2024-01-01 12:00:00"))
    ).toDF("rk", "ws", "we")
    // 45-min buckets: the 2h interval spans 3+ buckets; membership must be
    // decided by the exact filter, not the bucket
    val ids = TemporalJoins.rangeJoin(
        left, right, col("k"), col("rk"), col("ts"), col("ws"), col("we"), bucketSeconds = 2700)
      .select(col("id")).as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }

  test("rangeJoin drops empty and inverted intervals instead of exploding wrong buckets") {
    val left = Seq((1L, "k1", t("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(
      ("k1", t("2024-01-01 10:00:00"), t("2024-01-01 10:00:00")), // empty
      ("k1", t("2024-01-01 12:00:00"), t("2024-01-01 09:00:00"))  // inverted
    ).toDF("rk", "ws", "we")
    val n = TemporalJoins.rangeJoin(
      left, right, col("k"), col("rk"), col("ts"), col("ws"), col("we"), 3600).count()
    assert(n == 0L)
  }
}
