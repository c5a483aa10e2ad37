package graft.operators

import java.util.concurrent.locks.ReentrantLock

import org.apache.spark.sql.DataFrame

import graft.config.DynamicProperty

/** C2 — enforced rate limiting with hot reload (closing SURVEY §2.6 C2 and
  * the live half of §2.8 P4).
  *
  * The reference meters permits per partition with a token bucket
  * (`processor/.../internal/AveragingRateLimiter.java:36-124`, reserve at
  * :73-103, burst = 1 second of permits), swaps the bucket when the dynamic
  * rate property changes (`DynamicRateLimiter.java:24-64`), and parks
  * acquirers entirely while the rate is 0 (`InfiniteBlocker.java:23-48`).
  *
  * Spark placement: admission happens on the driver at a trigger boundary —
  * [[RateLimit.gated]] wraps a foreachBatch body and acquires one permit per
  * input row before the batch runs. That is the micro-batch equivalent of the
  * reference pacing its consume loop: the whole query's intake obeys
  * `rate × partitions` with at most one trigger of burst, and no executor
  * ever needs shared mutable state. (Source-side `maxOffsetsPerTrigger`
  * bounds the batch size so one admission call never waits unboundedly.)
  */
trait RateLimiter extends AutoCloseable {
  /** Block until `permits` are available; returns nanos actually waited. */
  def acquire(permits: Int): Long
  def acquire(): Long = acquire(1)
  override def close(): Unit = ()
}

object RateLimiter {
  /** Rate >= 1: token bucket. 0: pause until changed. < 0: unlimited. */
  def forRate(
      permitsPerSecond: Long,
      nanoTime: () => Long = System.nanoTime _,
      sleepNanos: Long => Unit = AveragingRateLimiter.parkSleep): RateLimiter =
    if (permitsPerSecond < 0) Unlimited
    else if (permitsPerSecond == 0) throw new IllegalArgumentException(
      "rate 0 means pause; only DynamicRateLimiter can wait for a rate change")
    else new AveragingRateLimiter(permitsPerSecond, 1.0, nanoTime, sleepNanos)

  object Unlimited extends RateLimiter {
    def acquire(permits: Int): Long = 0L
  }
}

/** Token bucket with burst capacity `maxBurstSeconds` worth of permits —
  * the reference's averaging limiter (`AveragingRateLimiter.java:36-124`).
  * Guava-SmoothBursty-style accounting: stored permits absorb bursts; once
  * drained, each fresh permit pushes `nextFreeNanos` forward by
  * `1e9 / permitsPerSecond`, and the acquirer sleeps until its reservation.
  * Clock and sleeper are injectable so the regime tests run on virtual time.
  */
final class AveragingRateLimiter(
    val permitsPerSecond: Long,
    maxBurstSeconds: Double = 1.0,
    nanoTime: () => Long = System.nanoTime _,
    sleepNanos: Long => Unit = AveragingRateLimiter.parkSleep) extends RateLimiter {
  require(permitsPerSecond > 0, s"rate must be positive, got $permitsPerSecond")

  private val nanosPerPermit: Double = 1e9 / permitsPerSecond
  private val maxStored: Double = permitsPerSecond * maxBurstSeconds
  private val lock = new ReentrantLock
  // starts with a full burst, like the reference (a fresh limiter admits the
  // first second of traffic immediately)
  private var stored: Double = maxStored
  private var nextFreeNanos: Long = nanoTime()

  /** Reserve `permits` and return how long the caller must wait (nanos).
    * Stored permits refill ONLY from idle time past `nextFreeNanos` — time
    * spent paying down earlier reservations must not also earn permits, or
    * the effective rate doubles.
    */
  def reserve(permits: Int): Long = {
    require(permits > 0)
    lock.lock()
    try {
      val now = nanoTime()
      if (now > nextFreeNanos) {
        stored = math.min(maxStored, stored + (now - nextFreeNanos) / nanosPerPermit)
        nextFreeNanos = now
      }
      val wait = nextFreeNanos - now // >= 0 after the sync above
      val fromStored = math.min(stored, permits.toDouble)
      val fresh = permits - fromStored
      stored -= fromStored
      nextFreeNanos += (fresh * nanosPerPermit).toLong
      wait
    } finally lock.unlock()
  }

  def acquire(permits: Int): Long = {
    val w = reserve(permits)
    if (w > 0) sleepNanos(w)
    w
  }
}

object AveragingRateLimiter {
  val parkSleep: Long => Unit = n => java.util.concurrent.locks.LockSupport.parkNanos(n)
}

/** Hot-swappable limiter driven by a [[DynamicProperty]]
  * (`DynamicRateLimiter.java:24-64`): a rate change takes effect on the next
  * acquisition; rate 0 parks acquirers until the rate changes again or the
  * limiter closes (`InfiniteBlocker.java:23-48` — the reference wakes
  * blocked threads on property reload, mirrored here with notifyAll).
  * Bind the property to a [[graft.config.FilePropertySupplier]] and a file
  * edit re-rates a RUNNING query at its next trigger boundary (P4).
  */
final class DynamicRateLimiter(
    prop: DynamicProperty[Long],
    nanoTime: () => Long = System.nanoTime _,
    sleepNanos: Long => Unit = AveragingRateLimiter.parkSleep) extends RateLimiter {

  private val pauseLock = new Object
  @volatile private var closed = false
  // (rate, bucket-for-that-rate): the bucket is derived from the OBSERVED
  // rate at acquire time, never from listener ordering — DynamicProperty
  // updates its value BEFORE firing listeners, so a listener-maintained
  // bucket could be read stale (a 0→N resume would admit unmetered)
  @volatile private var cached: (Long, Option[AveragingRateLimiter]) = {
    val r = prop.value
    (r, build(r))
  }

  // listener only WAKES pause waiters; deregistered on close so a closed
  // limiter doesn't stay reachable from the property for its lifetime
  private val deregister: () => Unit =
    prop.onChange { (_, _) => pauseLock.synchronized(pauseLock.notifyAll()) }

  private def build(rate: Long): Option[AveragingRateLimiter] =
    if (rate > 0) Some(new AveragingRateLimiter(rate, 1.0, nanoTime, sleepNanos)) else None

  /** The bucket for the rate as observed NOW. The synchronized path re-reads
    * the property inside the lock, so a thread carrying a stale snapshot can
    * never overwrite a newer bucket with an older rate (which would discard
    * reservation debt and grant an extra full burst).
    */
  private def currentLimiter(): (Long, Option[AveragingRateLimiter]) = {
    val c = cached
    if (c._1 == prop.value) c
    else synchronized {
      val r = prop.value
      if (cached._1 != r) cached = (r, build(r))
      cached
    }
  }

  def acquire(permits: Int): Long = {
    val start = nanoTime()
    var waitedForResume = false
    while (prop.value == 0 && !closed) {
      waitedForResume = true
      pauseLock.synchronized {
        if (prop.value == 0 && !closed) pauseLock.wait(100)
      }
    }
    val elapsed = if (waitedForResume) nanoTime() - start else 0L
    val (rate, lim) = currentLimiter()
    if (closed || rate <= 0) elapsed
    else lim match {
      case Some(l) => elapsed + l.acquire(permits)
      case None    => elapsed
    }
  }

  override def close(): Unit = {
    pauseLock.synchronized {
      closed = true
      pauseLock.notifyAll()
    }
    deregister()
  }
}

/** foreachBatch admission gates. */
object RateGate {
  /** Wrap a foreachBatch body so each batch acquires one permit per row
    * before processing. The batch is persisted before counting so the
    * admission count() and the body share ONE source scan per trigger (a
    * naked count() would re-read the file/Kafka micro-batch); bound the
    * batch with `maxOffsetsPerTrigger` so a single admission never waits
    * more than roughly one trigger of permits.
    */
  def gated(limiter: RateLimiter)(process: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (df, batchId) => {
      df.persist()
      try {
        val n = df.count()
        if (n > 0) limiter.acquire(math.min(n, Int.MaxValue.toLong).toInt)
        process(df, batchId)
      } finally df.unpersist()
    }
}
