package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.storage.StorageLevel

import graft.api.{ProcessResult, RecordProcessor, TaskPipeline}
import graft.core.Task

/** E1 — retry queueing, driven to convergence.
  *
  * In production this is a cycle through Kafka: failures re-produce to
  * `<topic>-retry` with `retry_count+1` and a backoff-shifted scheduled time
  * (`DecatonTaskRetryQueueingProcessor.java:60-112`), and the same
  * subscription consumes the retry topic (`ProcessorsBuilder.RetryTaskExtractor:164-206`)
  * — each hop is one more micro-batch of the same streaming query, so the
  * "loop" costs nothing on the driver.
  *
  * This harness replays that cycle eagerly (one iteration per retry hop) for
  * batch verification: it returns the terminal disposition of every task.
  * Give-up semantics: a task whose retry_count exceeds `maxRetries` is
  * surfaced in `gaveUp`, the reference's documented `retry_count`-driven
  * give-up pattern (`docs/retry-queueing.adoc`).
  */
object RetryLoop {

  final case class Outcome[T, U](
      processed: Seq[Task[U]],
      discarded: Seq[Task[T]],
      errored: Seq[Task[T]],
      gaveUp: Seq[Task[T]],
      /** Tasks still pending when the loop stopped (only non-empty if the hop
        * bound was hit before convergence) — surfaced so no task ever
        * silently vanishes from the accounting.
        */
      pending: Seq[Task[T]],
      hops: Int)

  def processWithRetries[T, U](
      input: Dataset[Task[T]],
      processor: RecordProcessor[T, U],
      backoffMillis: Long,
      maxRetries: Long,
      nowMillis: Long)(
      implicit encT: Encoder[Task[T]], encU: Encoder[Task[U]]): Outcome[T, U] = {

    var pending = input
    var processed = Vector.empty[Task[U]]
    var discarded = Vector.empty[Task[T]]
    var errored = Vector.empty[Task[T]]
    var gaveUp = Vector.empty[Task[T]]
    var hops = 0L
    // saturating bound: maxRetries = Long.MaxValue means "retry forever"
    val maxHops = if (maxRetries >= Long.MaxValue - 1) Long.MaxValue else maxRetries + 1
    // the previous hop's persisted retries: needed only until this hop's
    // tagged pass materializes (it is `pending`'s lineage parent); without
    // the handoff below one cached dataset per hop leaks for the session
    var prevRetries: Option[Dataset[Task[T]]] = None

    while (hops <= maxHops && !pending.isEmpty) {
      // persist the tagged pass so the per-disposition views below share ONE
      // processor execution — a side-effecting processor must run exactly
      // once per task per hop
      val streams = new TaskPipeline(pending).thenProcess(processor)
        .persist(StorageLevel.MEMORY_AND_DISK)
      processed ++= streams.processed.collect() // materializes the full cache
      prevRetries.foreach(_.unpersist())
      prevRetries = None
      discarded ++= streams.discarded.collect()
      errored ++= streams.errored.collect()
      val retries = streams.retries(backoffMillis, nowMillis + hops * backoffMillis)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val (stillTrying, exhausted) =
        (retries.filter((t: Task[T]) => t.metadata.retryCount <= maxRetries),
         retries.filter((t: Task[T]) => t.metadata.retryCount > maxRetries))
      gaveUp ++= exhausted.collect()
      streams.unpersist()
      prevRetries = Some(retries)
      pending = stillTrying
      hops += 1
    }
    val leftover = if (pending.isEmpty) Seq.empty[Task[T]] else pending.collect().toSeq
    prevRetries.foreach(_.unpersist())
    Outcome(processed, discarded, errored, gaveUp, leftover, hops.toInt)
  }
}
