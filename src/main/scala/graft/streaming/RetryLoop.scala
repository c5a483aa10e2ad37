package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.storage.StorageLevel

import graft.api.{ProcessedStreams, RecordProcessor, TaskPipeline}
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

  /** Terminal dispositions as DATASETS — lazy unions of per-hop views over
    * the per-hop persisted tagged passes, so nothing is ever resident on the
    * driver and the result scales with executor storage, not driver heap.
    * The backing caches stay pinned until [[Outcome.unpersist]]; consume (or
    * write out) the views first, then release.
    */
  final case class Outcome[T, U](
      processed: Dataset[Task[U]],
      discarded: Dataset[Task[T]],
      errored: Dataset[Task[T]],
      gaveUp: Dataset[Task[T]],
      /** Tasks still pending when the loop stopped (only non-empty if the hop
        * bound was hit before convergence) — surfaced so no task ever
        * silently vanishes from the accounting.
        */
      pending: Dataset[Task[T]],
      hops: Int,
      private val caches: Seq[ProcessedStreams[T, U]]) {
    /** Release the per-hop caches backing every view above. After this the
      * views would re-execute the processor if evaluated again — consume
      * first.
      */
    def unpersist(): Unit = caches.foreach(_.unpersist())
  }

  def processWithRetries[T, U](
      input: Dataset[Task[T]],
      processor: RecordProcessor[T, U],
      backoffMillis: Long,
      maxRetries: Long,
      nowMillis: Long)(
      implicit encT: Encoder[Task[T]], encU: Encoder[Task[U]]): Outcome[T, U] = {

    val spark = input.sparkSession
    def empty[A](implicit enc: Encoder[A]): Dataset[A] = spark.emptyDataset[A]
    def acc[A](cur: Dataset[A], next: Dataset[A]): Dataset[A] = cur.union(next)

    var pending = input
    var processed = empty[Task[U]]
    var discarded = empty[Task[T]]
    var errored = empty[Task[T]]
    var gaveUp = empty[Task[T]]
    var caches = Vector.empty[ProcessedStreams[T, U]]
    var hops = 0L
    // saturating bound: maxRetries = Long.MaxValue means "retry forever"
    val maxHops = if (maxRetries >= Long.MaxValue - 1) Long.MaxValue else maxRetries + 1

    try {
      while (hops <= maxHops && !pending.isEmpty) {
        // persist the tagged pass and materialize it FULLY (counts is one
        // aggregate over every partition) so (a) a side-effecting processor
        // runs exactly once per task per hop, and (b) the lazy disposition
        // views below — and the next hop's input — only ever read the cache
        val streams = new TaskPipeline(pending).thenProcess(processor)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // track BEFORE materializing: a hop that throws inside `counts`
        // (fatal processor error, lost executor) must leave every persisted
        // pass reachable for the cleanup below — an untracked cache entry
        // would be pinned until session end
        caches :+= streams
        streams.counts
        processed = acc(processed, streams.processed)
        discarded = acc(discarded, streams.discarded)
        errored = acc(errored, streams.errored)
        val retries = streams.retries(backoffMillis, nowMillis + hops * backoffMillis)
        gaveUp = acc(gaveUp, retries.filter((t: Task[T]) => t.metadata.retryCount > maxRetries))
        pending = retries.filter((t: Task[T]) => t.metadata.retryCount <= maxRetries)
        hops += 1
      }
    } catch {
      case t: Throwable =>
        // no Outcome will be returned, so nothing else can ever release the
        // per-hop caches — release them here and rethrow
        caches.foreach(s => try s.unpersist() catch { case _: Throwable => () })
        throw t
    }
    Outcome(processed, discarded, errored, gaveUp, pending, hops.toInt, caches)
  }
}
