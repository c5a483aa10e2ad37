package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Observability for task pipelines — the engine-side counters the reference
  * exposes per subscription (`tasks.processed` / `tasks.discarded` /
  * `tasks.error` incremented in `ProcessPipeline.java:79-91,145-184`;
  * catalog in `docs/monitoring.adoc`).
  *
  * Implemented with Spark's observable metrics: `df.observe` attaches the
  * counters to the plan itself, so they ride every batch job
  * (QueryExecutionListener) and every streaming micro-batch
  * (`StreamingQueryProgress.observedMetrics`) without a second pass over the
  * data — the Spark-native replacement for the reference's Micrometer
  * registry.
  */
object TaskMetrics {

  val MetricName = "graft.tasks"

  /** Attach disposition counters to a frame carrying a `stateCol` with values
    * processed/retry/discard/error (the tri-state routing column).
    */
  def observeDispositions(df: DataFrame, stateCol: Column, name: String = MetricName): DataFrame =
    df.observe(name,
      count(lit(1)).as("tasks_total"),
      count(when(stateCol === "processed", lit(1))).as("tasks_processed"),
      count(when(stateCol === "retry", lit(1))).as("tasks_retried"),
      count(when(stateCol === "discard", lit(1))).as("tasks_discarded"),
      count(when(stateCol === "error", lit(1))).as("tasks_error"))

  /** Generic throughput/latency observation for any task frame: row count and
    * event-time bounds (delivery-latency inputs of the reference's
    * BenchmarkResult, `benchmark/.../BenchmarkResult.java:32-100`).
    */
  def observeThroughput(df: DataFrame, tsMillisCol: Column, name: String = "graft.throughput"): DataFrame =
    df.observe(name,
      count(lit(1)).as("rows"),
      min(tsMillisCol).as("min_event_ts"),
      max(tsMillisCol).as("max_event_ts"))
}
