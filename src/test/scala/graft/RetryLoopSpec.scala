package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.{ProcessResult, RecordProcessor}
import graft.core.{Task, TaskMetadata}
import graft.streaming.RetryLoop

class RetryLoopSpec extends SparkTestBase {

  private def mkTasks(n: Int) = {
    import spark.implicits._
    spark.createDataset((0 until n).map { i =>
      Task(TaskMetadata(timestampMillis = 1000L + i), s"k$i".getBytes("UTF-8"), i)
    })
  }

  test("tasks that succeed on attempt k are processed with retry_count k") {
    import spark.implicits._
    // deterministic flake: task i fails its first (i % 3) attempts
    val p = new RecordProcessor[Int, Int] {
      def process(t: Task[Int]): ProcessResult[Int] =
        if (t.metadata.retryCount < t.value % 3) ProcessResult.Retry
        else ProcessResult.Processed(t.value * 10)
    }
    val out = RetryLoop.processWithRetries(mkTasks(30), p,
      backoffMillis = 100L, maxRetries = 5L, nowMillis = 0L)
    // specs are the ONE place the outcome views get collected — main code
    // returns lazy Datasets so nothing is ever driver-resident
    assert(out.processed.count() == 30)       // at-least-once: all delivered
    assert(out.gaveUp.isEmpty && out.errored.isEmpty)
    out.processed.collect().foreach { t =>
      assert(t.metadata.retryCount == (t.value / 10) % 3) // succeeded on the right hop
    }
    out.unpersist()
  }

  test("permanently failing tasks give up after maxRetries (retry_count cap)") {
    import spark.implicits._
    val p = new RecordProcessor[Int, Int] {
      def process(t: Task[Int]): ProcessResult[Int] =
        if (t.value % 5 == 0) ProcessResult.Retry // never succeeds
        else ProcessResult.Processed(t.value)
    }
    val out = RetryLoop.processWithRetries(mkTasks(20), p,
      backoffMillis = 50L, maxRetries = 2L, nowMillis = 0L)
    assert(out.processed.count() == 16)
    assert(out.gaveUp.count() == 4)
    out.gaveUp.collect().foreach(t => assert(t.metadata.retryCount == 3L)) // maxRetries+1 attempts
    out.unpersist()
  }

  test("a hop that fails FATALLY releases every per-hop cache (r14 review pass)") {
    import spark.implicits._
    // NonFatal errors become the error disposition; a FATAL one (here
    // InterruptedException, outside NonFatal) fails the Spark job mid-loop —
    // no Outcome is returned, so RetryLoop itself must release the caches it
    // persisted or they stay pinned until session end
    val p = new RecordProcessor[Int, Int] {
      def process(t: Task[Int]): ProcessResult[Int] = {
        if (t.metadata.retryCount >= 1) throw new InterruptedException("fatal mid-loop")
        if (t.value % 2 == 0) ProcessResult.Retry else ProcessResult.Processed(t.value)
      }
    }
    // compare against pre-existing storage: another suite's cache must not
    // pollute the assertion either way
    val before = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    intercept[org.apache.spark.SparkException] {
      RetryLoop.processWithRetries(mkTasks(10), p,
        backoffMillis = 10L, maxRetries = 3L, nowMillis = 0L)
    }
    // unpersist is async — poll storage until the loop's blocks are gone
    def leaked() = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet -- before
    val deadline = System.currentTimeMillis() + 10000
    while (leaked().nonEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(leaked().isEmpty, "failed loop must not strand persisted per-hop passes")
  }

  test("retry metadata carries monotone backoff schedule") {
    import spark.implicits._
    val p = new RecordProcessor[Int, Int] {
      def process(t: Task[Int]): ProcessResult[Int] =
        if (t.metadata.retryCount < 2) ProcessResult.Retry
        else ProcessResult.Processed(t.value)
    }
    val out = RetryLoop.processWithRetries(mkTasks(5), p,
      backoffMillis = 100L, maxRetries = 3L, nowMillis = 1000L)
    assert(out.processed.count() == 5)
    // each survivor was scheduled at hop 2: now + hop*backoff + backoff
    out.processed.collect().foreach(t => assert(t.metadata.scheduledTimeMillis >= 1100L))
    out.unpersist()
  }
}
