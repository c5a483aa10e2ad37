package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.Column

import graft.Tables

/** Second tranche of the relational surface: distinct, set operations,
  * semi/anti joins, rollup, conditional aggregation, string/date/JSON scalar
  * functions, scalar subqueries, sessionization. Same determinism contract as
  * [[RelationalQueries]].
  */
object ExtendedQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  val all: Seq[Q] = Seq(
    // ---- exact distinct aggregation (expand + two-phase agg in Spark).
    Q(
      "q07_distinct_users",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(
            countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events"),
            round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      },
      Some("""
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events,
               round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
        FROM events GROUP BY event_type
      """)),

    // ---- set operations: INTERSECT / EXCEPT (distinct semantics both sides).
    Q(
      "q08_setops",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir)
        val building = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
        val urgent   = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("custkey"))
        val both     = building.intersect(urgent).withColumn("tag", lit("building_and_urgent"))
        val onlyB    = building.except(urgent).withColumn("tag", lit("building_no_urgent"))
        both.unionAll(onlyB).groupBy(col("tag")).agg(count(lit(1)).as("n"))
      },
      Some("""
        WITH building AS (SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             urgent   AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
             both_t   AS (SELECT custkey, 'building_and_urgent' AS tag FROM (SELECT custkey FROM building INTERSECT SELECT custkey FROM urgent)),
             only_b   AS (SELECT custkey, 'building_no_urgent' AS tag FROM (SELECT custkey FROM building EXCEPT SELECT custkey FROM urgent))
        SELECT tag, count(*) AS n FROM (SELECT * FROM both_t UNION ALL SELECT * FROM only_b) GROUP BY tag
      """)),

    // ---- left-semi join (EXISTS): customers having >=1 urgent order.
    Q(
      "q09_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
      """)),

    // ---- left-anti join (NOT EXISTS): customers with no orders at all.
    Q(
      "q10_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_customers"),
               round(sum(dec(col("c_acctbal"))).cast("double"), 2).as("sum_acctbal"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
      """)),

    // ---- rollup (hierarchical grouping sets); NULL grouping keys coalesced
    // to 'ALL' so the two engines need not agree on grouping_id encoding.
    Q(
      "q11_rollup",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .rollup(col("c_mktsegment"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
               round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("total"))
          .select(
            coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("total"))
      },
      Some("""
        SELECT coalesce(c_mktsegment, 'ALL') AS segment,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY ROLLUP (c_mktsegment, o_orderpriority)
      """)),

    // ---- conditional aggregation (CASE WHEN inside agg) — pivot-equivalent.
    Q(
      "q12_case_agg",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_orderstatus"))
          .agg(
            round(sum(when(col("o_orderpriority") === "1-URGENT", dec(col("o_totalprice"))).otherwise(lit(0))).cast("double"), 2).as("urgent_total"),
            round(sum(when(col("o_orderpriority") =!= "1-URGENT", dec(col("o_totalprice"))).otherwise(lit(0))).cast("double"), 2).as("other_total"),
            count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"))
      },
      Some("""
        SELECT o_orderstatus,
               round(CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE), 2) AS urgent_total,
               round(CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE), 2) AS other_total,
               count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent
        FROM orders GROUP BY o_orderstatus
      """)),

    // ---- string scalar functions: upper/substring/length/concat/replace.
    Q(
      "q13_string_funcs",
      (s, dir) => {
        val p = Tables.part(s, dir)
        p.select(
            upper(col("p_brand")).as("brand_u"),
            substring(col("p_type"), 1, 5).as("type_pfx"),
            length(col("p_name")).as("name_len"))
          .groupBy(col("brand_u"), col("type_pfx"))
          .agg(count(lit(1)).as("n"), sum(col("name_len")).as("sum_len"))
      },
      Some("""
        SELECT upper(p_brand) AS brand_u, substring(p_type, 1, 5) AS type_pfx,
               count(*) AS n, CAST(sum(length(p_name)) AS BIGINT) AS sum_len
        FROM part GROUP BY 1, 2
      """)),

    // ---- date bucketing: year/month extraction + aggregation.
    Q(
      "q14_date_buckets",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
          .agg(count(lit(1)).as("n_orders"),
               round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("total"))
      },
      Some("""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total
        FROM orders GROUP BY 1, 2
      """)),

    // ---- scalar subquery: orders strictly above the global mean price.
    // Compared in exact decimal via cross-multiplication (price*N > sum) so
    // parallel float averaging cannot flip the comparison.
    Q(
      "q15_above_avg",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val tot = o.agg(
          sum(dec(col("o_totalprice"))).as("sum_all"),
          count(lit(1)).as("n_all"))
        o.crossJoin(broadcast(tot))
          .filter(dec(col("o_totalprice")) * col("n_all") > col("sum_all"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_above"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS n_above
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(12,2)) * (SELECT count(*) FROM orders)
              > (SELECT sum(CAST(o_totalprice AS DECIMAL(12,2))) FROM orders)
        GROUP BY o_orderpriority
      """)),

    // ---- sessionization: gap > 30 min starts a new session (lag + cumulative
    // sum over an event-time window) — the batch shape of streaming sessions.
    Q(
      "q16_sessionize",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        e.withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
                 col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
          .withColumn("sess_id", sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"))
          .agg(max(col("sess_id")).as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""
        SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM (
          SELECT user_id,
                 sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
          FROM (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800 THEN 1 ELSE 0 END AS new_sess
            FROM (
              SELECT user_id, ts, event_id,
                     lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
              FROM events))
        ) GROUP BY user_id
      """)),

    // ---- JSON scalar extraction from the props column.
    Q(
      "q17_json_extract",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.select(get_json_object(col("props"), "$.k").cast("int").as("k"), col("event_type"))
          .groupBy((col("k") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("n_types"))
      },
      Some("""
        SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
               count(*) AS n, count(DISTINCT event_type) AS n_types
        FROM events GROUP BY 1
      """)),

    // ---- HAVING (post-aggregation filter).
    Q(
      "q18_having",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        li.groupBy(col("l_suppkey"))
          .agg(round(sum(dec(col("l_extendedprice"))).cast("double"), 2).as("revenue"),
               count(lit(1)).as("n_lines"))
          .filter(col("n_lines") >= 100)
      },
      Some("""
        SELECT l_suppkey,
               round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS revenue,
               count(*) AS n_lines
        FROM lineitem GROUP BY l_suppkey HAVING count(*) >= 100
      """)),

    // ---- UNION ALL of heterogeneous slices + reaggregation.
    Q(
      "q19_union_all",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val hi = e.filter(col("value") >= 100).select(col("event_type"), lit("hi").as("band"), col("value"))
        val lo = e.filter(col("value") < 100).select(col("event_type"), lit("lo").as("band"), col("value"))
        hi.unionAll(lo)
          .groupBy(col("event_type"), col("band"))
          .agg(count(lit(1)).as("n"), round(sum(dec(col("value"))).cast("double"), 2).as("sum_value"))
      },
      Some("""
        SELECT event_type, band, count(*) AS n,
               round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_value
        FROM (
          SELECT event_type, 'hi' AS band, value FROM events WHERE value >= 100
          UNION ALL
          SELECT event_type, 'lo' AS band, value FROM events WHERE value < 100
        ) GROUP BY event_type, band
      """)),

    // ---- outer joins: LEFT with null-extension and FULL OUTER agg.
    Q(
      "q23_outer_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"),
            round(sum(dec(col("o_totalprice"))).cast("double"), 2).as("urgent_total"))
        c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_mktsegment"))
          .agg(
            count(lit(1)).as("n_customers"),
            count(col("n_urgent")).as("n_with_urgent"),
            round(sum(coalesce(col("urgent_total"), lit(0))).cast("double"), 2).as("seg_urgent_total"))
      },
      Some("""
        SELECT c_mktsegment, count(*) AS n_customers,
               count(n_urgent) AS n_with_urgent,
               round(CAST(sum(coalesce(urgent_total, 0)) AS DOUBLE), 2) AS seg_urgent_total
        FROM customer LEFT OUTER JOIN (
          SELECT o_custkey, count(*) AS n_urgent,
                 round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS urgent_total
          FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
        ) o ON c_custkey = o_custkey
        GROUP BY c_mktsegment
      """)),

    // ---- full outer join with both-side null handling.
    Q(
      "q24_full_outer",
      (s, dir) => {
        val hi = Tables.events(s, dir).filter(col("value") >= 150)
          .groupBy(col("user_id").as("u")).agg(count(lit(1)).as("n_hi"))
        val err = Tables.events(s, dir).filter(col("event_type") === "error")
          .groupBy(col("user_id").as("u2")).agg(count(lit(1)).as("n_err"))
        hi.join(err, col("u") === col("u2"), "full_outer")
          .select(
            coalesce(col("u"), col("u2")).as("user_id"),
            coalesce(col("n_hi"), lit(0)).as("n_hi"),
            coalesce(col("n_err"), lit(0)).as("n_err"),
            (col("u").isNotNull && col("u2").isNotNull).cast("int").as("in_both"))
      },
      Some("""
        SELECT coalesce(h.u, e.u2) AS user_id,
               coalesce(n_hi, 0) AS n_hi, coalesce(n_err, 0) AS n_err,
               CASE WHEN h.u IS NOT NULL AND e.u2 IS NOT NULL THEN 1 ELSE 0 END AS in_both
        FROM (SELECT user_id AS u, count(*) AS n_hi FROM events WHERE value >= 150 GROUP BY 1) h
        FULL OUTER JOIN (SELECT user_id AS u2, count(*) AS n_err FROM events WHERE event_type = 'error' GROUP BY 1) e
        ON h.u = e.u2
      """)),

    // ---- exact percentiles: median and p90 by distributed two-pass rank
    // selection (graft.operators.Percentiles) — bit-identical to the
    // `percentile` aggregate this replaced, WITHOUT its per-group
    // value->count map in final aggregation (a multi-GB reducer buffer once
    // distinct prices grow with the data).
    Q(
      "q21_percentile",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val pcts = graft.operators.Percentiles.exactGroupPercentiles(
          o, col("o_orderpriority"), col("o_totalprice"), Seq(0.5, 0.9))
        pcts.groupBy(col("g"))
          .agg(
            round(max(when(col("p") === 0.5, col("pct"))), 4).as("median_price"),
            round(max(when(col("p") === 0.9, col("pct"))), 4).as("p90_price"),
            max(col("n")).as("n"))
          .select(col("g").as("o_orderpriority"),
            col("median_price"), col("p90_price"), col("n"))
      },
      Some("""
        SELECT o_orderpriority,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price,
               count(*) AS n
        FROM orders GROUP BY o_orderpriority
      """)),

    // ---- array scalar functions over tokenized strings.
    Q(
      "q22_array_funcs",
      (s, dir) => {
        val p = Tables.part(s, dir)
        val toks = split(col("p_name"), " ")
        p.select(
            col("p_partkey"),
            size(toks).as("n_tokens"),
            element_at(toks, 1).as("first_tok"),
            array_contains(toks, "green").cast("int").as("has_green"),
            array_join(array_sort(array_distinct(toks)), ",").as("sorted_toks"))
      },
      Some("""
        SELECT p_partkey,
               len(string_split(p_name, ' ')) AS n_tokens,
               string_split(p_name, ' ')[1] AS first_tok,
               CASE WHEN list_contains(string_split(p_name, ' '), 'green') THEN 1 ELSE 0 END AS has_green,
               array_to_string(list_sort(list_distinct(string_split(p_name, ' '))), ',') AS sorted_toks
        FROM part
      """)),

    // ---- min_by/max_by (argmax): latest event value per user — the batch
    // form of streaming compaction's "keep winner per key". max_by over an
    // ordering struct is ONE partial-aggregatable shuffle; a row_number
    // window would pay a full per-partition sort for the same answer (the
    // same argument Compaction.compactBatch makes).
    Q(
      "q20_argmax",
      (s, dir) => {
        val e = Tables.events(s, dir)
        e.groupBy(col("user_id"))
          .agg(max_by(
            struct(col("event_id"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("w"))
          .select(col("user_id"), col("w.event_id").as("last_event_id"),
                  col("w.event_type").as("last_type"),
                  round(dec(col("w.value")).cast("double"), 2).as("last_value"))
      },
      Some("""
        SELECT user_id, event_id AS last_event_id, event_type AS last_type,
               round(CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE), 2) AS last_value
        FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
      """)),

    // ---- AS-OF join (the classic operator Spark lacks): for every event,
    // the customer's latest order placed on-or-before the event time. One
    // keyed shuffle+sort (union + running last_value), never a per-row
    // subquery; orders are pre-compacted to one row per (cust, date) so the
    // as-of row is well-defined. DuckDB verifies with its NATIVE ASOF JOIN.
    Q(
      "q25_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val oc = Tables.orders(s, dir)
          .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ots"))
          .agg(max_by(struct(col("o_orderkey"), col("o_totalprice")), col("o_orderkey")).as("w"))
          .select(col("o_custkey"), col("ots"),
            col("w.o_orderkey").as("ok"), col("w.o_totalprice").as("price"))
        graft.operators.TemporalJoins.asOfJoin(
            e, oc, col("user_id"), col("o_custkey"), col("ts"), col("ots"),
            rightPayload = Seq(col("ok"), col("price")))
          .select(col("event_id"), col("user_id"),
            col("asof.ok").as("last_order"),
            round(dec(col("asof.price")).cast("double"), 2).as("last_price"))
      },
      Some("""
        WITH oc AS (
          SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ots,
                 max(o_orderkey) AS ok, arg_max(o_totalprice, o_orderkey) AS price
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id, oc.ok AS last_order,
               round(CAST(CAST(oc.price AS DECIMAL(12,2)) AS DOUBLE), 2) AS last_price
        FROM events e ASOF LEFT JOIN oc
          ON e.user_id = oc.o_custkey AND e.ts >= oc.ots
      """)),

    // ---- range (interval) join: each (user, day)'s first event opens a
    // 2-hour window; count the user's events inside it. Bucketed equi-join
    // (bounded fan-out per interval) instead of the inequality theta join
    // Spark would plan as a nested loop; DuckDB verifies with the plain
    // inequality join.
    Q(
      "q26_range_join",
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
        val w0 = e.groupBy(col("user_id").as("wk"), to_date(col("ts")).as("day"))
          .agg(min(col("ts")).as("wstart"))
          .withColumn("wend", col("wstart") + expr("INTERVAL 2 HOURS"))
        graft.operators.TemporalJoins.rangeJoin(
            e, w0, col("user_id"), col("wk"), col("ts"),
            col("wstart"), col("wend"), bucketSeconds = 2L * 3600)
          .groupBy(col("wk").as("user_id"), col("day"))
          .agg(count(lit(1)).as("n_events"), countDistinct(col("event_id")).as("n_distinct"))
      },
      Some("""
        WITH w AS (
          SELECT user_id AS wk, CAST(ts AS DATE) AS day, min(ts) AS wstart
          FROM events GROUP BY 1, 2)
        SELECT w.wk AS user_id, w.day, count(*) AS n_events, count(DISTINCT e.event_id) AS n_distinct
        FROM w JOIN events e
          ON e.user_id = w.wk
         AND e.ts >= w.wstart
         AND e.ts < w.wstart + INTERVAL 2 HOUR
        GROUP BY 1, 2
      """)),

    // ---- CUBE: all grouping-set combinations. NOT the naive
    // `li.cube(...)` — that plans Expand×4 over the full fact table
    // (4× the rows into the shuffle). Since cube keys are low-cardinality,
    // aggregate per (flag, status) FIRST (one map-side-combinable shuffle
    // down to ~6 rows), then cube the tiny aggregate and re-sum: the
    // Expand multiplies 6 rows, not 600k — the only cube shape that
    // survives 100 TB. Sums are decimal, so re-aggregation is exact.
    Q(
      "q27_cube",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val base = li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(dec(col("l_quantity"))).as("qty"), count(lit(1)).as("n"))
        base.cube(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("qty")).cast("double"), 2).as("sum_qty"),
            sum(col("n")).as("n_lines"))
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
      """)),

    // ---- PIVOT: order-status columns per customer. Spark's pivot with an
    // explicit value list compiles to conditional aggregation (one shuffle,
    // no second pass to discover values) — the oracle states that form
    // directly. Explicit values are also the 100 TB shape: discovery-pivot
    // needs an extra distinct scan.
    Q(
      "q28_pivot",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.groupBy(col("o_custkey"))
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(round(sum(dec(col("o_totalprice"))).cast("double"), 2))
          .select(col("o_custkey"),
            coalesce(col("O"), lit(0d)).as("open_total"),
            coalesce(col("F"), lit(0d)).as("filled_total"),
            coalesce(col("P"), lit(0d)).as("partial_total"))
      },
      Some("""
        SELECT o_custkey,
               coalesce(round(CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2), 0) AS open_total,
               coalesce(round(CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2), 0) AS filled_total,
               coalesce(round(CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2), 0) AS partial_total
        FROM orders GROUP BY o_custkey
      """))
  )
}
