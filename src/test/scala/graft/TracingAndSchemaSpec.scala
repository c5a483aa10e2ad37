package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import graft.api._
import graft.config.{EngineProperties, FilePropertySupplier, PropertyDefinition}
import graft.core.{Task, TaskMetadata}

class TracingAndSchemaSpec extends SparkTestBase {

  test("tracing spans bracket each task with its terminal outcome, incl. errors") {
    import spark.implicits._
    TracingProvider.Recording.spans.clear()
    val tasks = Seq(
      Task(TaskMetadata(), "1".getBytes, "ok"),
      Task(TaskMetadata(), "2".getBytes, "retry"),
      Task(TaskMetadata(), "3".getBytes, "discard"),
      Task(TaskMetadata(), "4".getBytes, "boom")).toDS()
    val streams = new TaskPipeline(tasks).thenProcessTraced(
      new RecordProcessor[String, Int] {
        def process(t: Task[String]): ProcessResult[Int] = t.value match {
          case "ok"      => ProcessResult.Processed(1)
          case "retry"   => ProcessResult.Retry
          case "discard" => ProcessResult.Discard
          case _         => throw new RuntimeException("boom")
        }
      },
      new TracingProvider.Recording)
    // force the single pass
    assert(streams.processed.count() == 1)
    val spans = TracingProvider.Recording.spans.asScala
      .map(s => s._1 -> s._2).toMap
    assert(spans == Map("1" -> "processed", "2" -> "retry", "3" -> "discard", "4" -> "error"))
    assert(TracingProvider.Recording.spans.asScala.forall(_._3 >= 0L))
  }

  test("published schema JSON covers the engine properties; file values validate against it") {
    val schemaPath = Files.createTempFile("graft-schema", ".json")
    val defs: Seq[PropertyDefinition[_]] = Seq(
      EngineProperties.IgnoreKeys, EngineProperties.PartitionConcurrency,
      EngineProperties.MaxPendingRecords, EngineProperties.ProcessingRate,
      EngineProperties.CommitIntervalMs, EngineProperties.RetryBackoffMs,
      EngineProperties.LegacyParseFallbackEnabled)
    FilePropertySupplier.publishSchema(defs, schemaPath)
    val json = Files.readString(schemaPath)
    defs.foreach(d => assert(json.contains(d.name), s"schema must list ${d.name}"))
    assert(json.contains("\"type\": \"integer\"") && json.contains("\"type\": \"boolean\""))

    val cfg = Files.createTempFile("graft-conf", ".properties")
    Files.writeString(cfg,
      """decaton.processing.rate.per.partition=2000000
        |decaton.partition.concurrency=4
        |decaton.typo.key=1
        |""".stripMargin)
    val supplier = new FilePropertySupplier(cfg, pollMillis = 60000L)
    try {
      val problems = supplier.validateAll(defs)
      // rate over MaxRatePerPartition violates the validator; typo'd key is
      // reported as unknown; concurrency=4 is clean
      assert(problems.size == 2, s"expected 2 problems, got: $problems")
      assert(problems.exists(_.contains("decaton.processing.rate.per.partition")))
      assert(problems.exists(_.contains("decaton.typo.key")))
    } finally supplier.close()
  }
}
