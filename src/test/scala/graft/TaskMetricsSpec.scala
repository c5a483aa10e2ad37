package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.metrics.TaskMetrics

object TaskMetricsSpec {
  val captured = new ConcurrentLinkedQueue[Map[String, Any]]()
}

class TaskMetricsSpec extends SparkTestBase {

  test("observable disposition metrics ride the plan (batch listener)") {
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        val m = qe.observedMetrics
        if (m.contains(TaskMetrics.MetricName)) {
          val row = m(TaskMetrics.MetricName)
          TaskMetricsSpec.captured.add(
            row.schema.fieldNames.zip(row.toSeq).toMap)
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      TaskMetricsSpec.captured.clear()
      val e = Tables.events(spark, sfDir)
        .withColumn("state",
          when(col("value") < 10, lit("retry"))
            .when(col("event_id") % 17 === 0, lit("discard"))
            .otherwise(lit("processed")))
      val observed = TaskMetrics.observeDispositions(e, col("state"))
      val total = observed.count()
      // the listener fires asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 10000
      while (TaskMetricsSpec.captured.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val metrics = TaskMetricsSpec.captured.peek()
      assert(metrics != null, "no observed metrics captured")
      // counter names ARE the reference's vocabulary (metrics/Metrics.java)
      // so existing dashboards translate 1:1
      assert(metrics.keySet == Set("tasks.total", "tasks.processed",
        "retry.queued.tasks", "tasks.discarded", "tasks.error"),
        s"metric names must match the reference vocabulary, got ${metrics.keySet}")
      assert(metrics("tasks.total") == total)
      assert(metrics("tasks.processed").asInstanceOf[Long] +
        metrics("retry.queued.tasks").asInstanceOf[Long] +
        metrics("tasks.discarded").asInstanceOf[Long] +
        metrics("tasks.error").asInstanceOf[Long] == total)
      assert(metrics("retry.queued.tasks").asInstanceOf[Long] > 0)
    } finally spark.listenerManager.unregister(listener)
  }

  test("delivery-latency observation carries the reference timer's name") {
    val e = Tables.events(spark, sfDir).limit(100)
      .withColumn("ts_ms", unix_millis(col("ts")))
    val observed = TaskMetrics.observeThroughput(
      e, col("ts_ms"), col("ts_ms") + lit(250L))
    observed.count()
    val fields = observed.queryExecution.analyzed.collectFirst {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c.metrics.map(_.name)
    }.getOrElse(Seq.empty)
    assert(fields.contains("tasks.delivery.latency.avg.ms") &&
      fields.contains("tasks.delivery.latency.max.ms"),
      s"delivery latency must publish under the reference name, got $fields")
  }

  test("per-partition pending/offset gauges (PartitionStateMetrics analog)") {
    import spark.implicits._
    val rows = Seq(
      (0, 10L, false), (0, 11L, true), (0, 12L, true),
      (1, 5L, false), (1, 6L, false))
    val g = TaskMetrics.partitionGauges(
        rows.toDF("partition", "offset", "pending"),
        col("partition"), col("pending"), col("offset"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(g(0) == ((2L, 12L)), s"partition 0 gauges wrong: $g")
    assert(g(1) == ((0L, 6L)), s"partition 1 gauges wrong: $g")
    // gauge column names are the reference's partition-scoped vocabulary
    val names = TaskMetrics.partitionGauges(
      rows.toDF("partition", "offset", "pending"),
      col("partition"), col("pending"), col("offset")).columns.toSeq
    assert(names == Seq("partition", "tasks.pending", "offset.latest.consumed"), names.toString)
  }

  private def observedNames(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics =>
        c.metrics.map(_.name)
    }.flatten

  test("timer observations publish the reference names with Micrometer's percentiles") {
    import spark.implicits._
    val t = (1L to 200L).map(i => (i * 10L, i * 10L + i)).toDF("submitted", "completed")
    val obs = TaskMetrics.observeCompleteDuration(t, col("submitted"), col("completed"))
    val row = obs.select(lit(1)).count() // force the observation
    assert(row == 200L)
    val names = observedNames(obs)
    for (s <- Seq("count", "avg.ms", "max.ms", "p50.ms", "p90.ms", "p99.ms", "p999.ms"))
      assert(names.contains(s"tasks.complete.duration.$s"), s"missing $s in $names")
    val pNames = observedNames(TaskMetrics.observeProcessDuration(
      t, col("submitted"), col("completed")))
    assert(pNames.contains("tasks.process.duration.p99.ms"), pNames.toString)
    val sNames = observedNames(TaskMetrics.observeScheduledDelay(
      t, col("submitted"), col("submitted"), col("completed")))
    assert(sNames.contains("tasks.scheduled.process.delay.avg.ms") &&
      sNames.contains("tasks.scheduling.delay.avg.ms"), sNames.toString)
  }

  test("timeout / queueing-outcome / record-format counters count what they claim") {
    import spark.implicits._
    val tasks = Seq(
      ("retry", true, 1, false, false),
      ("retry", true, 2, false, false),
      ("retry", false, 3, false, true),
      ("shaping", true, 0, false, false),
      ("shaping", false, 0, true, true),
      ("main", true, 0, true, false)).toDF("sink", "ok", "retries", "timed_out", "legacy")

    def observedRow(df: org.apache.spark.sql.DataFrame, name: String): Map[String, Any] = {
      var out: Map[String, Any] = null
      val l = new QueryExecutionListener {
        override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit =
          qe.observedMetrics.get(name).foreach { r =>
            out = r.schema.fieldNames.zip(r.toSeq).toMap
          }
        override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
      }
      spark.listenerManager.register(l)
      try {
        df.count()
        val deadline = System.currentTimeMillis() + 10000
        while (out == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      } finally spark.listenerManager.unregister(l)
      assert(out != null, s"no observation captured for $name")
      out
    }

    val q = observedRow(TaskMetrics.observeQueueingOutcomes(
      tasks, col("sink"), col("ok"), col("retries")), "graft.queueing")
    assert(q("retry.queued.tasks") == 2L && q("retry.queueing.failed") == 1L, q.toString)
    assert(q("shaping.queued.tasks") == 1L && q("shaping.queueing.failed") == 1L, q.toString)
    assert(q("retry.task.retries.max") == 3, q.toString)

    val t = observedRow(TaskMetrics.observeTimeouts(
      tasks, col("timed_out")), "graft.commitcontrol")
    assert(t("tasks.timeout") == 2L, t.toString)

    val r = observedRow(TaskMetrics.observeRecordFormats(
      tasks, col("legacy")), "graft.records")
    assert(r("records.consumed.format.decaton.client.v9") == 4L &&
      r("records.consumed.format.other") == 2L, r.toString)
  }

  test("subpartition and partition-state gauge tables carry the full reference vocabulary") {
    import spark.implicits._
    val sub = TaskMetrics.subpartitionGauges(
      Seq((0, 0, 10L), (0, 0, 20L), (0, 1, 5L), (1, 0, 7L))
        .toDF("p", "sp", "ms"),
      col("p"), col("sp"), col("ms"))
    assert(sub.columns.toSeq ==
      Seq("partition", "subpartition", "tasks.queued", "processor.processed.time.ms"))
    val m = sub.collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(m((0, 0)) == ((2L, 30L)) && m((0, 1)) == ((1L, 5L)) && m((1, 0)) == ((1L, 7L)), m.toString)

    // one row per (partition, trigger): trigger 2 is latest for partition 0
    val state = Seq(
      (0, 1L, 3L, true, 100L, 0L, 50L, 10L, 12L),
      (0, 2L, 1L, false, 0L, 20L, 0L, 11L, 14L),
      (1, 1L, 0L, false, 0L, 500L, 0L, 6L, 6L))
      .toDF("p", "trig", "pending", "paused", "paused_ms", "starved_ms", "throttled_ms", "committed", "consumed")
    val g = TaskMetrics.partitionStateGauges(state,
      col("p"), col("pending"), col("paused"), col("paused_ms"),
      col("starved_ms"), col("throttled_ms"), col("committed"), col("consumed"), col("trig"))
    assert(g.columns.toSeq == Seq("partition", "tasks.pending", "partition.paused",
      "partition.paused.time.ms", "partition.queue.starved.time.ms",
      "partition.throttled.time.ms", "offset.last.committed", "offset.latest.consumed"))
    val gm = g.collect().map(r => r.getInt(0) -> r.toSeq.drop(1)).toMap
    // latest-trigger pending/paused, summed times, max offsets
    assert(gm(0) == Seq(1L, 0, 100L, 20L, 50L, 11L, 14L), gm.toString)
    assert(gm(1) == Seq(0L, 0, 0L, 500L, 0L, 6L, 6L), gm.toString)
  }

  test("the full reference metric vocabulary is published (no missing rows)") {
    import spark.implicits._
    // every metric name in the reference's Metrics.java:160-349, verbatim
    val referenceVocabulary = Set(
      "tasks.processed", "tasks.discarded", "tasks.error",
      "tasks.complete.duration", "tasks.process.duration",
      "tasks.delivery.latency", "tasks.scheduled.process.delay",
      "tasks.timeout",
      "processor.processed.time", "tasks.queued",
      "tasks.pending", "partition.paused", "offset.last.committed",
      "offset.latest.consumed", "partition.queue.starved.time",
      "partition.paused.time",
      "records.consumed",
      "tasks.scheduling.delay", "partition.throttled.time",
      "retry.queued.tasks", "retry.queueing.failed", "retry.task.retries",
      "shaping.queued.tasks", "shaping.queueing.failed")
    val t = Seq((1L, 2L)).toDF("a", "b")
    val published: Set[String] =
      (observedNames(TaskMetrics.observeDispositions(t, lit("processed"))) ++
        observedNames(TaskMetrics.observeThroughput(t, col("a"), col("b"))) ++
        observedNames(TaskMetrics.observeCompleteDuration(t, col("a"), col("b"))) ++
        observedNames(TaskMetrics.observeProcessDuration(t, col("a"), col("b"))) ++
        observedNames(TaskMetrics.observeScheduledDelay(t, col("a"), col("a"), col("b"))) ++
        observedNames(TaskMetrics.observeTimeouts(t, lit(false))) ++
        observedNames(TaskMetrics.observeQueueingOutcomes(t, lit("retry"), lit(true), col("a"))) ++
        observedNames(TaskMetrics.observeRecordFormats(t, lit(false))) ++
        TaskMetrics.partitionGauges(
          Seq((0, 1L, false)).toDF("p", "o", "pen"), col("p"), col("pen"), col("o")).columns ++
        TaskMetrics.subpartitionGauges(
          Seq((0, 0, 1L)).toDF("p", "sp", "ms"), col("p"), col("sp"), col("ms")).columns ++
        TaskMetrics.partitionStateGauges(
          Seq((0, 1L, 1L, false, 0L, 0L, 0L, 0L, 0L))
            .toDF("p", "t", "pen", "pa", "pms", "sms", "tms", "co", "cons"),
          col("p"), col("pen"), col("pa"), col("pms"), col("sms"), col("tms"),
          col("co"), col("cons"), col("t")).columns).toSet
    val missing = referenceVocabulary.filterNot(ref =>
      published.exists(p => p == ref || p.startsWith(ref + ".")))
    assert(missing.isEmpty,
      s"reference metrics with no published analog: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
