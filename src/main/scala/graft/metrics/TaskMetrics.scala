package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observability for task pipelines, published under the REFERENCE'S metric
  * vocabulary (`processor/src/main/java/.../metrics/Metrics.java`) so a
  * user's existing dashboards translate 1:1:
  *
  *   - `tasks.processed` / `tasks.discarded` / `tasks.error` — the
  *     disposition counters incremented in `ProcessPipeline.java:79-91,
  *     145-184`;
  *   - `retry.queued.tasks` — `Metrics.java:322-327` (RetryMetrics);
  *   - `tasks.delivery.latency` — `Metrics.java:192-200`, here as
  *     avg/max millis per batch window;
  *   - `tasks.pending` / `offset.latest.consumed` — the per-partition
  *     gauges (`Metrics.java:256-263`, PartitionStateMetrics), here a
  *     gauge TABLE keyed by partition (Spark's `observe` aggregates
  *     whole-frame, so per-partition scope becomes a grouped aggregate).
  *
  * Implemented with Spark's observable metrics: `df.observe` attaches the
  * counters to the plan itself, so they ride every batch job
  * (QueryExecutionListener) and every streaming micro-batch
  * (`StreamingQueryProgress.observedMetrics`) without a second pass over the
  * data — the Spark-native replacement for the reference's Micrometer
  * registry. Full name mapping: README "Metric-name parity".
  */
object TaskMetrics {

  val MetricName = "graft.tasks"

  /** Attach disposition counters to a frame carrying a `stateCol` with values
    * processed/retry/discard/error (the tri-state routing column). Counter
    * names are the reference's own; `tasks.total` is this engine's addition
    * (the reference derives totals by summing dispositions).
    */
  def observeDispositions(df: DataFrame, stateCol: Column, name: String = MetricName): DataFrame =
    df.observe(name,
      count(lit(1)).as("tasks.total"),
      count(when(stateCol === "processed", lit(1))).as("tasks.processed"),
      count(when(stateCol === "retry", lit(1))).as("retry.queued.tasks"),
      count(when(stateCol === "discard", lit(1))).as("tasks.discarded"),
      count(when(stateCol === "error", lit(1))).as("tasks.error"))

  /** Generic throughput/latency observation for any task frame: row count,
    * event-time bounds, and the reference's delivery-latency timer
    * (`tasks.delivery.latency`, `Metrics.java:192-200`) as avg/max millis
    * against `processedAtMillis` (pass the batch's processing timestamp;
    * the reference measures produce→process the same way, from the task's
    * own timestampMillis).
    */
  def observeThroughput(
      df: DataFrame,
      tsMillisCol: Column,
      processedAtMillis: Column,
      name: String = "graft.throughput"): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      min(tsMillisCol).as("min_event_ts"),
      max(tsMillisCol).as("max_event_ts"),
      avg(processedAtMillis - tsMillisCol).as("tasks.delivery.latency.avg.ms"),
      max(processedAtMillis - tsMillisCol).as("tasks.delivery.latency.max.ms"))

  /** Per-partition gauge table — the reference's partition-scoped gauges
    * (`tasks.pending`, `offset.latest.consumed`; PartitionStateMetrics,
    * `Metrics.java:239-266`). `pendingCol` marks rows not yet complete
    * (e.g. watermark not passed — O1's commit watermark surface). One
    * partial-agg shuffle on the partition id, output is one row per
    * partition — publishable as-is to any sink or registry bridge.
    */
  def partitionGauges(
      df: DataFrame,
      partitionCol: Column,
      pendingCol: Column,
      offsetCol: Column): DataFrame =
    df.groupBy(partitionCol.as("partition"))
      .agg(
        count(when(pendingCol, lit(1))).as("tasks.pending"),
        max(offsetCol).as("offset.latest.consumed"))
}
