package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** One verifiable query: a Spark DataFrame program plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Determinism contract (so the driver's hash-compare can't flap):
  *   - monetary/double aggregates are computed in exact DECIMAL arithmetic and
  *     only converted to (rounded) DOUBLE at the very end, with the identical
  *     formula on the DuckDB side — parallel summation order then cannot change
  *     the result;
  *   - every top-k / limit is fully ordered with a unique tiebreak column;
  *   - column names are aliased identically on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Relational operator surface. The reference (Decaton) has no relational
  * operators at all — SURVEY.md §2.9 — so this module is the Catalyst-native
  * capability layer our engine adds on top of the streaming semantics; each
  * query doubles as a correctness probe for one operator family.
  */
object RelationalQueries {

  /** Exact-decimal view of a double money column (TPC-H values have <=2 dp). */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val all: Seq[Q] = Seq(
    // ---- grouped aggregation (TPC-H Q1 shape): partial-agg friendly,
    // map-side combine, no join. At 100 TB this is a single shuffle on two
    // low-cardinality keys — the canonical "let Catalyst do it" plan.
    Q(
      "q01_pricing_summary",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(dec(col("l_quantity"))).cast("double"), 2).as("sum_qty"),
            round(sum(dec(col("l_extendedprice"))).cast("double"), 2).as("sum_base_price"),
            round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double"), 2)
              .as("sum_disc_price"),
            round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))) * (lit(1) + dec(col("l_tax"))))
              .cast("double"), 2).as("sum_charge"),
            round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS sum_disc_price,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE), 2) AS sum_charge,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
      """)),

    // ---- filter + projection: predicate pushdown / column pruning probe.
    // The parquet scan must show PushedFilters on l_shipdate/l_discount and a
    // 4-column ReadSchema.
    Q(
      "q02_filter_project",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.filter(
            col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
            dec(col("l_discount")).between(lit(0.05), lit(0.07)) &&
            col("l_quantity") < 24)
          .agg(round(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double"), 2).as("revenue"),
               count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE), 2) AS revenue,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND CAST(l_discount AS DECIMAL(12,2)) BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
      """)),

    // ---- broadcast-join + agg (TPC-H Q3 shape). customer/orders are dims vs
    // lineitem fact; customer is explicitly broadcast — at 100 TB the fact
    // table never shuffles for this join.
    Q(
      "q03_join_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .filter(col("c_mktsegment") === "BUILDING")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).cast("double"), 2)
              .as("revenue"),
            countDistinct(col("o_orderkey")).as("n_orders"))
      },
      Some("""
        SELECT o_orderpriority,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderpriority
      """)),

    // ---- multi-way join through the dimension chain (TPC-H Q5 shape):
    // fact ⋈ orders ⋈ customer ⋈ nation ⋈ region with tiny dims broadcast.
    Q(
      "q04_multi_join",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val o  = Tables.orders(s, dir)
        val c  = Tables.customer(s, dir)
        val n  = Tables.nation(s, dir)
        val r  = Tables.region(s, dir)
        // partial agg pushed BELOW the big join: lineitem first reduces to
        // one row per order (map-side combine, ~4× fewer rows into the
        // orderkey shuffle, and the join build side shrinks the same 4×);
        // Catalyst doesn't do this rewrite itself, and it's the difference
        // between shuffling line items and shuffling orders at 100 TB.
        // Decimal sums re-aggregate exactly.
        val perOrder = li.groupBy(col("l_orderkey"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))).as("rev"),
            count(lit(1)).as("n"))
        perOrder.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            round(sum(col("rev")).cast("double"), 2).as("revenue"),
            sum(col("n")).as("n_lines"))
      },
      Some("""
        SELECT r_name, n_name,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
      """)),

    // ---- top-k with full deterministic order (sort + limit). Spark plans
    // this as TakeOrderedAndProject — no global sort of the fact table.
    Q(
      "q05_topk_customers",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.groupBy(col("o_custkey"))
          .agg(round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("total_spent"),
               count(lit(1)).as("n_orders"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("total_spent"), col("n_orders"))
          .orderBy(col("total_spent").desc, col("c_custkey").asc)
          .limit(10)
      },
      Some("""
        SELECT c_custkey, c_name, total_spent, n_orders
        FROM (
          SELECT o_custkey,
                 round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_spent,
                 count(*) AS n_orders
          FROM orders GROUP BY o_custkey
        ) t JOIN customer ON o_custkey = c_custkey
        ORDER BY total_spent DESC, c_custkey ASC
        LIMIT 10
      """)),

    // ---- SQL window functions: rank / lag / running sum over a partition.
    Q(
      "q06_window_rank",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        o.withColumn("rn", row_number().over(w))
          .withColumn("prev_price", round(coalesce(lag(dec(col("o_totalprice")), 1).over(w), lit(0)).cast("double"), 2))
          .withColumn("run_total",
            round(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"), 2))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("prev_price"), col("run_total"))
      },
      Some("""
        SELECT o_custkey, rn, o_orderkey, prev_price, run_total
        FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER w AS rn,
                 round(CAST(coalesce(lag(CAST(o_totalprice AS DECIMAL(12,2)), 1) OVER w, 0) AS DOUBLE), 2) AS prev_price,
                 round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS run_total
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        ) WHERE rn <= 3
      """))
  )
}
