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
      assert(metrics("tasks_total") == total)
      assert(metrics("tasks_processed").asInstanceOf[Long] +
        metrics("tasks_retried").asInstanceOf[Long] +
        metrics("tasks_discarded").asInstanceOf[Long] +
        metrics("tasks_error").asInstanceOf[Long] == total)
      assert(metrics("tasks_retried").asInstanceOf[Long] > 0)
    } finally spark.listenerManager.unregister(listener)
  }
}
