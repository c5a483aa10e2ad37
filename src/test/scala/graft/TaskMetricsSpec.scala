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
}
