package graft.streaming

import java.util.concurrent.{Executors, Semaphore}

import scala.collection.mutable
import scala.concurrent.duration._
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference's headline capability — concurrent processing of a single
  * partition with per-key ordering (`docs/why-decaton.adoc`; per-key FIFO
  * worker queues `ThreadPoolSubPartitions.java:38-118` / virtual-thread-per-
  * key `VirtualThreadSubPartitions.java:34-81`) — re-expressed for Spark's
  * execution model.
  *
  * Spark parallelism is partition-level; an I/O-bound `map` (4 ms RPC × 5 per
  * record) would cap throughput at partitions/latency. [[mapAsyncKeyed]]
  * multiplexes many in-flight records per partition on an executor-JVM-wide
  * pool, while chaining same-key records through dependent futures — a future
  * chain IS a per-key FIFO queue, so the reference's SERIAL_PROCESSING and
  * PROCESS_ORDERING guarantees hold inside each partition, and cross-key work
  * overlaps freely. Back-pressure: a bounded in-flight window (results are
  * emitted in input order, so at-least-once replay semantics per micro-batch
  * are unchanged).
  */
object AsyncProcessing {

  /** Executor-JVM-wide I/O pool (shared by all partitions on the executor —
    * the analog of the reference's per-partition thread pools, sized once).
    * FIXED, not cached: with thousands of in-flight blocking calls a cached
    * pool finds no idle thread at submit time and pays a thread spawn per
    * task (~50 µs, which capped throughput at ~20k tasks/s); fixed threads
    * persist across tasks. Size via `graft.async.io.threads` (default 2048).
    */
  private lazy val ioPool: ExecutionContext = {
    val n = sys.props.getOrElse("graft.async.io.threads", "2048").toInt
    ExecutionContext.fromExecutorService(Executors.newFixedThreadPool(n, r => {
      // small explicit stack: these threads only block on I/O (or sleep);
      // thousands of default 1 MiB stacks would waste native memory and can
      // trip container thread limits
      val t = new Thread(null, r, "graft-async-io", 256 * 1024)
      t.setDaemon(true)
      t
    }))
  }

  /** Map `f` over the dataset with up to `maxInFlight` concurrent executions
    * per partition, same-key records strictly serial and in order. Each
    * in-flight record occupies one pool thread (blocking-client I/O — the
    * THREAD_POOL runtime analog); for future-returning clients use
    * [[flatMapAsyncKeyed]], which holds no thread while I/O is in flight.
    *
    * Serialism is per partition — route equal keys to one partition first
    * (`repartition(n, keyCol)` / [[graft.api.TaskPipeline.orderedPerKey]]),
    * exactly as the reference hashes keys to worker queues before its
    * per-queue serial execution (`DefaultSubPartitioner.java:26-58`).
    */
  def mapAsyncKeyed[T, K, U](
      ds: Dataset[T],
      maxInFlight: Int)(
      keyFn: T => K,
      f: T => U)(
      implicit encU: Encoder[U]): Dataset[U] = {
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ioPool
      val permits = new Semaphore(maxInFlight)
      val chains = mutable.Map.empty[K, Future[_]]

      var sincePrune = 0
      val futures: Iterator[Future[U]] = it.map { t =>
        val k = keyFn(t)
        val prev = chains.getOrElse(k, Future.unit)
        permits.acquire() // bound total in-flight work (back-pressure, O5)
        val fut = prev.transformWith { _ =>
          Future {
            try f(t)
            finally permits.release()
          }
        }
        chains(k) = fut
        // prune completed chains so high-cardinality partitions don't retain
        // one completed future (and its result) per distinct key
        sincePrune += 1
        if (sincePrune >= 1024) {
          sincePrune = 0
          chains.filterInPlace((_, cf) => !cf.isCompleted)
        }
        fut
      }

      // sliding in-flight window: emit in input order, keep the pipe full
      new Iterator[U] {
        private val window = mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (window.size < maxInFlight && futures.hasNext) window += futures.next()
        def hasNext: Boolean = { fill(); window.nonEmpty }
        def next(): U = { fill(); Await.result(window.dequeue(), 10.minutes) }
      }
    }
  }

  /** True-async variant for future-returning I/O clients (async HTTP/RPC):
    * same per-key serial chaining and in-order emission, but an in-flight
    * record holds NO thread — completion is driven by the client's own
    * machinery. This is the VIRTUAL_THREAD-runtime analog
    * (`VirtualThreadSubPartitions.java:34-81`): in-flight bound = permits,
    * not threads, so tens of thousands of concurrent I/Os per executor are
    * practical.
    */
  def flatMapAsyncKeyed[T, K, U](
      ds: Dataset[T],
      maxInFlight: Int)(
      keyFn: T => K,
      f: T => Future[U])(
      implicit encU: Encoder[U]): Dataset[U] = {
    ds.mapPartitions { it =>
      implicit val ec: ExecutionContext = ioPool
      val permits = new Semaphore(maxInFlight)
      val chains = mutable.Map.empty[K, Future[_]]

      var sincePrune = 0
      val futures: Iterator[Future[U]] = it.map { t =>
        val k = keyFn(t)
        val prev = chains.getOrElse(k, Future.unit)
        permits.acquire()
        val fut = prev.transformWith { _ =>
          // a synchronously-throwing f must not leak the permit
          val ff = try f(t) catch { case scala.util.control.NonFatal(e) => Future.failed(e) }
          ff.andThen { case _ => permits.release() }
        }
        chains(k) = fut
        // bound chain-map memory on high-cardinality keys: completed chains
        // pin their results; prune periodically (consumer thread only — the
        // map is never touched from callbacks, so no race)
        sincePrune += 1
        if (sincePrune >= 1024) {
          sincePrune = 0
          chains.filterInPlace((_, cf) => !cf.isCompleted)
        }
        fut
      }

      new Iterator[U] {
        private val window = mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (window.size < maxInFlight && futures.hasNext) window += futures.next()
        def hasNext: Boolean = { fill(); window.nonEmpty }
        def next(): U = { fill(); Await.result(window.dequeue(), 10.minutes) }
      }
    }
  }

  /** Hashed-wheel timer (1 ms tick) for simulating async I/O latency at
    * scale. ScheduledThreadPoolExecutor parks per fire (and the kernel adds
    * ~50 µs timer slack per park), capping it near 100k fires/s; the wheel
    * parks once per millisecond and fires the whole due bucket, so millions
    * of outstanding timers complete at memory speed.
    */
  private final class Wheel {
    private val buckets =
      new java.util.concurrent.ConcurrentSkipListMap[Long, java.util.concurrent.ConcurrentLinkedQueue[() => Unit]]()
    /** Last tick time; deadlines at or before this fire inline in schedule(). */
    @volatile private var wheelNow = 0L
    /** Buckets are only removed once this much past due AND drained — a
      * scheduler would have to stall longer than this between building its
      * deadline and inserting to race the removal.
      */
    private val StaleMs = 50L
    @volatile private var started = false
    private def ensureTicker(): Unit = if (!started) synchronized {
      if (!started) {
        val t = new Thread(null, () => {
          while (true) {
            val now = System.currentTimeMillis()
            wheelNow = now
            val due = buckets.headMap(now, true).entrySet().iterator()
            while (due.hasNext) {
              val e = due.next()
              val q = e.getValue
              // a throwing body must not kill the ticker (every other timer
              // on this wheel would silently never fire again)
              var f = q.poll()
              while (f != null) {
                try f() catch { case scala.util.control.NonFatal(_) => }
                f = q.poll()
              }
              if (e.getKey <= now - StaleMs && q.isEmpty) {
                due.remove()
                // final drain: catch a body added between the isEmpty check
                // and removal
                f = q.poll()
                while (f != null) {
                  try f() catch { case scala.util.control.NonFatal(_) => }
                  f = q.poll()
                }
              }
            }
            Thread.sleep(1)
          }
        }, "graft-async-wheel", 1 << 20)
        t.setDaemon(true)
        t.start()
        started = true
      }
    }
    def schedule(deadlineMillis: Long)(body: () => Unit): Unit = {
      ensureTicker()
      if (deadlineMillis <= wheelNow) body() // already due: fire inline
      else buckets.computeIfAbsent(deadlineMillis,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]()).add(body)
    }
  }

  /** Independent wheel shards: one ticker thread fires ~250k bodies/s
    * (promise completion + next-hop scheduling run inline on the ticker);
    * sharding multiplies fire capacity for high simulated-I/O concurrency.
    */
  private lazy val wheels: Array[Wheel] = Array.fill(4)(new Wheel)

  /** A future that completes ~`delayMillis` later (±1 ms tick) without
    * holding a thread.
    */
  def delayed[U](delayMillis: Long)(value: => U): Future[U] = {
    val p = scala.concurrent.Promise[U]()
    val w = wheels(java.util.concurrent.ThreadLocalRandom.current().nextInt(wheels.length))
    w.schedule(System.currentTimeMillis() + delayMillis)(() => p.trySuccess(value))
    p.future
  }
}
