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
