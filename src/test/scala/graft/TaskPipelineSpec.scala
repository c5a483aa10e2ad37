package graft

import org.apache.spark.sql.functions._

import graft.api._
import graft.core._
import graft.sources.TaskSource

class TaskPipelineSpec extends SparkTestBase {

  private def pipeline() = {
    import spark.implicits._
    val records = TaskSource.fromEvents(spark, sfDir)
    val extractor = new TaskExtractor[String] {
      def extract(r: ConsumedRecord): Task[String] = Task(
        TaskMetadata(timestampMillis = r.timestampMillis),
        r.key,
        if (r.value == null) null else new String(r.value, "UTF-8"))
    }
    TaskPipeline.consuming(records, extractor)
  }

  test("consuming + extraction yields one task per record") {
    assert(pipeline().tasks.count() == Tables.events(spark, sfDir).count())
  }

  test("a throwing extractor is poison-discard, not job-fatal (E2 on the SPI path)") {
    import spark.implicits._
    val records = TaskSource.fromEvents(spark, sfDir)
    val total = records.count()
    val poisoned = TaskPipeline.consuming(records, new TaskExtractor[String] {
      def extract(r: ConsumedRecord): Task[String] = {
        // every key ending in 7 is "corrupt wire format"
        if (new String(r.key, "UTF-8").endsWith("7"))
          throw new IllegalArgumentException("unparseable payload")
        Task(TaskMetadata(timestampMillis = r.timestampMillis), r.key,
          new String(r.value, "UTF-8"))
      }
    })
    val corrupt = records.filter(r => new String(r.key, "UTF-8").endsWith("7")).count()
    assert(corrupt > 0, "fixture should contain keys ending in 7")
    // one corrupt record must not kill the job; the rest extract normally
    assert(poisoned.tasks.count() == total - corrupt)
    assert(poisoned.tasks.filter(t => new String(t.key, "UTF-8").endsWith("7")).count() == 0)
  }

  test("poison drops are COUNTED in the graft.tasks.poison accumulator, not just logged") {
    import spark.implicits._
    val records = TaskSource.fromEvents(spark, sfDir)
    val acc = TaskPipeline.poisonCounter(spark)
    val before = acc.value
    val poisoned = TaskPipeline.consuming(records, new TaskExtractor[String] {
      def extract(r: ConsumedRecord): Task[String] = {
        if (new String(r.key, "UTF-8").endsWith("7"))
          throw new IllegalArgumentException("unparseable payload")
        Task(TaskMetadata(timestampMillis = r.timestampMillis), r.key,
          new String(r.value, "UTF-8"))
      }
    })
    poisoned.tasks.count()
    val corrupt = records.filter(r => new String(r.key, "UTF-8").endsWith("7")).count()
    assert(corrupt > 0)
    // the reference counts extraction failures in its metrics family —
    // monitoring must see dropped records (ADVICE r13)
    assert(acc.value - before == corrupt,
      s"accumulator must count every poison drop: ${acc.value - before} vs $corrupt")
  }

  test("blockKeys drops exactly the ignored keys and nothing else") {
    import spark.implicits._
    val all = pipeline()
    val blockedKey = "1".getBytes("UTF-8")
    val remaining = all.blockKeys(Seq(blockedKey)).tasks
    val droppedCount = all.tasks.filter(_.key.toSeq == blockedKey.toSeq).count()
    assert(droppedCount > 0, "fixture should contain key '1'")
    assert(remaining.count() == all.tasks.count() - droppedCount)
    assert(remaining.filter(_.key.toSeq == blockedKey.toSeq).count() == 0)
  }

  test("tri-state processing splits processed/retry/discard/error disjointly") {
    import spark.implicits._
    val p = pipeline().thenProcess(new RecordProcessor[String, Int] {
      def process(t: Task[String]): ProcessResult[Int] = {
        val k = new String(t.key, "UTF-8").toLong
        if (k % 10 == 0) ProcessResult.Discard
        else if (k % 10 == 1) ProcessResult.Retry
        else if (k % 10 == 2) throw new RuntimeException("boom") // E3 path
        else ProcessResult.Processed(t.value.length)
      }
    })
    val total = pipeline().tasks.count()
    val now = 1706659200000L
    val n = p.processed.count() + p.retries(100L, now).count() +
      p.discarded.count() + p.errored.count()
    assert(n == total)
    // retry mutation: count+1 and scheduled in the future
    val r = p.retries(100L, now).collect()
    assert(r.nonEmpty)
    r.foreach { t =>
      assert(t.metadata.retryCount == 1L)
      assert(t.metadata.scheduledTimeMillis == now + 100L)
    }
  }

  test("dueBy filters to tasks whose scheduled time has arrived") {
    import spark.implicits._
    val base = pipeline()
    val withSched = base.thenTransform(_.map { t =>
      t.copy(metadata = t.metadata.copy(
        scheduledTimeMillis = t.metadata.timestampMillis))
    }(base.enc))
    val cutoff = 1705363200000L
    val due = withSched.dueBy(cutoff).tasks.count()
    val expected = withSched.tasks.filter(_.metadata.scheduledTimeMillis <= cutoff).count()
    assert(due == expected && due > 0)
  }

  test("orderedPerKey co-locates and orders each key's tasks") {
    import spark.implicits._
    val ordered = pipeline().orderedPerKey(4).tasks
    // within each partition, (key, ts) must be non-decreasing
    val violations = ordered.mapPartitions { it =>
      var prev: Option[(Seq[Byte], Long)] = None
      var bad = 0
      it.foreach { t =>
        val cur = (t.key.toSeq, t.metadata.timestampMillis)
        prev.foreach { p =>
          if (p._1 == cur._1 && p._2 > cur._2) bad += 1
        }
        prev = Some(cur)
      }
      Iterator.single(bad)
    }.collect().sum
    assert(violations == 0)
  }
}
