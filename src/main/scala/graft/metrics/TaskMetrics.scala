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
  *   - the per-task timers `tasks.complete.duration` /
  *     `tasks.process.duration` / `tasks.delivery.latency` /
  *     `tasks.scheduled.process.delay` / `tasks.scheduling.delay`
  *     (`Metrics.java:175-207,306-315`) — count/avg/max + the reference's
  *     published 50/90/99/99.9 percentiles per batch window;
  *   - `tasks.timeout` (`Metrics.java:211-215`, CommitControlMetrics);
  *   - `retry.queued.tasks` / `retry.queueing.failed` /
  *     `retry.task.retries` and `shaping.queued.tasks` /
  *     `shaping.queueing.failed` (`Metrics.java:322-349`);
  *   - `records.consumed` by envelope format (`Metrics.java:280-301`);
  *   - the per-partition gauges `tasks.pending` / `partition.paused` /
  *     `partition.paused.time` / `partition.queue.starved.time` /
  *     `partition.throttled.time` / `offset.last.committed` /
  *     `offset.latest.consumed` (`Metrics.java:234-277,316-320`) and the
  *     per-subpartition `tasks.queued` / `processor.processed.time`
  *     (`Metrics.java:219-232`) — gauge TABLES keyed by (sub)partition
  *     (Spark's `observe` aggregates whole-frame, so partition scope
  *     becomes a grouped aggregate).
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
    * (`tasks.delivery.latency`, `Metrics.java:192-200`) with the same
    * count/avg/max + 50/90/99/99.9 percentiles as the other task timers,
    * against `processedAtMillis` (pass the batch's processing timestamp;
    * the reference measures produce→process the same way, from the task's
    * own timestampMillis).
    */
  def observeThroughput(
      df: DataFrame,
      tsMillisCol: Column,
      processedAtMillis: Column,
      name: String = "graft.throughput"): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("rows"),
      min(tsMillisCol).as("min_event_ts"),
      max(tsMillisCol).as("max_event_ts")) ++
      timerAggs(processedAtMillis - tsMillisCol, "tasks.delivery.latency")
    df.observe(name, aggs.head, aggs.tail: _*)
  }

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

  /** Micrometer-Timer analog for one duration column: count + avg/max +
    * the reference's published percentiles (0.5/0.9/0.99/0.999 —
    * `Metrics.java:180-205` `publishPercentiles`). Rides the plan via
    * `observe`; `percentile_approx` keeps the sketch mergeable across
    * partitions so the observation is one map-side pass, no extra job.
    */
  private def timerAggs(durationMillis: Column, metric: String): Seq[Column] = Seq(
    count(durationMillis).as(s"$metric.count"),
    avg(durationMillis).as(s"$metric.avg.ms"),
    max(durationMillis).as(s"$metric.max.ms"),
    percentile_approx(durationMillis, lit(0.5), lit(1000)).as(s"$metric.p50.ms"),
    percentile_approx(durationMillis, lit(0.9), lit(1000)).as(s"$metric.p90.ms"),
    percentile_approx(durationMillis, lit(0.99), lit(1000)).as(s"$metric.p99.ms"),
    percentile_approx(durationMillis, lit(0.999), lit(1000)).as(s"$metric.p999.ms"))

  /** The reference's per-task timers (`Metrics.java:175-205`):
    * `tasks.complete.duration` (submit→completion, including deferred
    * completion — T4's EXTEND window) and `tasks.process.duration`
    * (processor execution alone). Pass the matching timestamp pair from
    * the pipeline's audit columns.
    */
  def observeCompleteDuration(
      df: DataFrame, submitMillis: Column, completeMillis: Column,
      name: String = "graft.complete"): DataFrame =
  {
    val aggs = timerAggs(completeMillis - submitMillis, "tasks.complete.duration")
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  def observeProcessDuration(
      df: DataFrame, startMillis: Column, endMillis: Column,
      name: String = "graft.process"): DataFrame =
  {
    val aggs = timerAggs(endMillis - startMillis, "tasks.process.duration")
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** Scheduler timers (`Metrics.java:200-207` `tasks.scheduled.process.delay`,
    * `Metrics.java:306-315` `tasks.scheduling.delay`): how late after its
    * scheduled time a task ran, and how long the scheduler actually slept
    * waiting for that time. The reference records the sleep from the moment
    * the task is PICKED UP off the queue (`ExecutionScheduler.java:83` —
    * `max(0, scheduledTime - timeAtPickup)`), not from when processing
    * finished — measured against `processedMillis` the clamp would zero
    * every normal row. So the sleep takes the pickup/dequeue timestamp;
    * `processedMillis` feeds only the lateness timer.
    */
  def observeScheduledDelay(
      df: DataFrame, scheduledMillis: Column, pickupMillis: Column,
      processedMillis: Column,
      name: String = "graft.scheduled"): DataFrame =
  {
    val aggs = timerAggs(processedMillis - scheduledMillis, "tasks.scheduled.process.delay") ++
      timerAggs(greatest(scheduledMillis - pickupMillis, lit(0L)), "tasks.scheduling.delay")
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** `tasks.timeout` (CommitControlMetrics, `Metrics.java:211-215`): tasks
    * forcefully completed by the deferred-completion timeout — T4's GIVE_UP
    * disposition column.
    */
  def observeTimeouts(df: DataFrame, timedOutCol: Column,
      name: String = "graft.commitcontrol"): DataFrame =
    df.observe(name, count(when(timedOutCol, lit(1))).as("tasks.timeout"))

  /** Retry/shaping sink outcome counters (`Metrics.java:322-349`):
    * `retry.queued.tasks` / `retry.queueing.failed` and
    * `shaping.queued.tasks` / `shaping.queueing.failed`, plus the
    * `retry.task.retries` distribution over the task metadata's retry
    * count — recorded ONLY for tasks routed to the retry sink, matching the
    * reference's recording site (one Micrometer record per retry-queued
    * task, `DecatonTaskRetryQueueingProcessor.java:101`) so main/shaping
    * traffic can't dilute the count/avg.
    * `sinkCol` is the routing column ("retry"/"shaping"), `okCol`
    * whether the produce succeeded (TaskWriter surfaces per-row produce
    * disposition; in Spark a failed task RETRIES the whole partition, so
    * row-level failures here mean rows REJECTED by the writer — oversize,
    * null key — not transient broker errors).
    */
  def observeQueueingOutcomes(
      df: DataFrame, sinkCol: Column, okCol: Column, retryCountCol: Column,
      name: String = "graft.queueing"): DataFrame =
  {
    val aggs = Seq(
      count(when(sinkCol === "retry" && okCol, lit(1))).as("retry.queued.tasks"),
      count(when(sinkCol === "retry" && !okCol, lit(1))).as("retry.queueing.failed"),
      count(when(sinkCol === "shaping" && okCol, lit(1))).as("shaping.queued.tasks"),
      count(when(sinkCol === "shaping" && !okCol, lit(1))).as("shaping.queueing.failed"),
      count(when(sinkCol === "retry", retryCountCol)).as("retry.task.retries.count"),
      avg(when(sinkCol === "retry", retryCountCol)).as("retry.task.retries.avg"),
      max(when(sinkCol === "retry", retryCountCol)).as("retry.task.retries.max"))
    df.observe(name, aggs.head, aggs.tail: _*)
  }

  /** `records.consumed` format counters (RecordMetrics,
    * `Metrics.java:280-301`): raw records split by envelope format so users
    * can decide when to disable the legacy parse fallback (F2's decode path
    * reports which format parsed). Micrometer publishes ONE name with a
    * `format` tag; `observe` has no tags, so the tag is encoded in the
    * flattened name the way most registry bridges do it.
    */
  def observeRecordFormats(df: DataFrame, isLegacyCol: Column,
      name: String = "graft.records"): DataFrame =
    df.observe(name,
      count(when(!isLegacyCol, lit(1))).as("records.consumed.format.decaton.client.v9"),
      count(when(isLegacyCol, lit(1))).as("records.consumed.format.other"))

  /** Sub-partition gauge table (ThreadUtilizationMetrics,
    * `Metrics.java:219-232`): `tasks.queued` per (partition, subpartition)
    * and `processor.processed.time` — the accumulated processing time the
    * reference's per-thread timer tracks, here summed from the per-task
    * duration column. One partial-agg shuffle on the subpartition key.
    */
  def subpartitionGauges(
      df: DataFrame,
      partitionCol: Column,
      subpartitionCol: Column,
      processMillisCol: Column): DataFrame =
    df.groupBy(partitionCol.as("partition"), subpartitionCol.as("subpartition"))
      .agg(
        count(lit(1)).as("tasks.queued"),
        sum(processMillisCol).as("processor.processed.time.ms"))

  /** Full PartitionStateMetrics gauge table (`Metrics.java:234-277`):
    * per-partition pending count, paused flag (1/0, latest trigger wins),
    * accumulated paused / queue-starved / throttled time, and the two
    * offset gauges. Input is the admission log the source/rate-limiter
    * surfaces per trigger: one row per (partition, trigger) with that
    * trigger's state. `offset.last.committed` comes from O1's commit
    * watermark (the highest offset all of whose predecessors completed),
    * `offset.latest.consumed` from the raw consume position.
    */
  def partitionStateGauges(
      df: DataFrame,
      partitionCol: Column,
      pendingCol: Column,
      pausedCol: Column,
      pausedMillisCol: Column,
      starvedMillisCol: Column,
      throttledMillisCol: Column,
      committedOffsetCol: Column,
      consumedOffsetCol: Column,
      triggerCol: Column): DataFrame =
    df.groupBy(partitionCol.as("partition"))
      .agg(
        max_by(pendingCol, triggerCol).as("tasks.pending"),
        max_by(pausedCol.cast("int"), triggerCol).as("partition.paused"),
        sum(pausedMillisCol).as("partition.paused.time.ms"),
        sum(starvedMillisCol).as("partition.queue.starved.time.ms"),
        sum(throttledMillisCol).as("partition.throttled.time.ms"),
        max(committedOffsetCol).as("offset.last.committed"),
        max(consumedOffsetCol).as("offset.latest.consumed"))
}
