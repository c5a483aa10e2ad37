package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the brief calls out as classically missing from Spark's
  * operator set: AS-OF join and range (interval) join. Both are composed
  * from existing operators (the preferred altitude — Catalyst sees a plain
  * plan and every built-in optimization applies) in their scale-safe shapes:
  * one keyed shuffle each, never a per-row subquery or an unbounded theta
  * join.
  */
object TemporalJoins {

  /** AS-OF (backward) left join: for every left row, the single right row
    * with the same key and the greatest `rightTs <= leftTs` (null-extended
    * when no such row exists).
    *
    * Shape: union the two sides tagged left/right, ONE shuffle+sort per key
    * on (ts, side), and a running `last(right_payload, ignoreNulls)` window
    * fills each left row with the most recent right payload at or before its
    * timestamp. Right rows sort before left rows at equal timestamps, so
    * `rightTs == leftTs` matches (inclusive as-of). This is O(n log n) per
    * key vs the O(n·m) per-key cross filter a naive compose would do, and at
    * 100 TB it is a single exchange on the join key — the same cost class as
    * any co-partitioned join.
    *
    * Right rows must be unique per (key, rightTs) — pre-compact with max_by
    * (see q25) so "the" as-of row is well-defined on every engine. Right
    * rows with a NULL key or NULL timestamp are dropped before the union
    * (SQL equality/inequality never match NULL — the same rows DuckDB's
    * ASOF JOIN can never produce); NULL-key left rows null-extend.
    *
    * @param rightPayload columns of `right` to carry onto matched left rows,
    *                     emitted as a struct column named `asof` (the left
    *                     frame must not already contain that name)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      rightTs: Column,
      rightPayload: Seq[Column]): DataFrame = {
    require(!left.columns.contains("asof"),
      "left frame already has a column named 'asof' (the output payload name)")

    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(rightPayload: _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType

    // NULL-key left rows can never match any right row — null-extend them
    // directly and keep them OUT of the window. Left in, they all hash to
    // the single NULL partition of the window exchange and get sorted for
    // nothing: one straggler task at any meaningful null-key fraction.
    // COST NOTE: the split reads the left lineage twice (two filter
    // branches, no shared Exchange beneath them) — when `left` is an
    // expensive derived frame, persist it before calling; the straggler
    // this split prevents is the worse default at any null fraction.
    val lNull = left.filter(leftKey.isNull)
      .select(lStruct.as("__l"), lit(null).cast(rType).as("asof"))
      .select(col("__l.*"), col("asof"))

    val l = left.filter(leftKey.isNotNull).select(
      leftKey.as("__k"), leftTs.as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // NULL keys/timestamps can never satisfy an equality/inequality join;
    // unfiltered they would sort first in the partition (NULLS FIRST) and
    // their payload would pollute the running last() for every left row
    val r = right
      .filter(rightKey.isNotNull && rightTs.isNotNull)
      .select(
        rightKey.as("__k"), rightTs.as("__ts"), lit(0).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as("asof"))
      .unionByName(lNull)
  }

  /** Range (interval) join, bucketed: pair every left row whose `leftTs`
    * falls in a right row's `[startTs, endTs)` with the same key.
    *
    * Shape: right intervals explode into fixed-width time buckets (bounded
    * fan-out = interval length / bucketWidth), left rows map to their single
    * bucket, and the equi-join on (key, bucket) + exact range filter finds
    * every pair — a linear scan + hash join instead of the inequality theta
    * join Spark would otherwise plan as a broadcast nested loop. The classic
    * scale shape for interval joins; `bucketSeconds` trades fan-out for
    * bucket selectivity and must exceed 0. Left and right column names must
    * not collide (the passed ts/start/end columns resolve in the joined
    * frame).
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTs: Column,
      startTs: Column,
      endTs: Column,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // bucket math runs on second-truncated longs; the exact range filter
    // runs on the ORIGINAL typed columns — truncation must only widen the
    // candidate set, never decide membership (a sub-second wstart would
    // otherwise admit events up to a second early)
    val l = left
      .withColumn("__k", leftKey)
      .withColumn("__bucket", floor(leftTs.cast("long") / bucketSeconds))
    val r = right
      .withColumn("__rk", rightKey)
      .withColumn("__s", startTs.cast("long"))
      .withColumn("__e", endTs.cast("long"))
      // empty/inverted intervals match nothing (and would otherwise make
      // sequence() count DOWN, exploding wrong buckets)
      .filter(endTs > startTs)
      .withColumn("__bucket",
        explode(sequence(floor(col("__s") / bucketSeconds), floor(col("__e") / bucketSeconds))))
      .drop("__s", "__e")
    l.join(r, col("__k") === col("__rk") && l("__bucket") === r("__bucket") &&
        leftTs >= startTs && leftTs < endTs)
      .drop("__k", "__rk", "__bucket")
  }
}
