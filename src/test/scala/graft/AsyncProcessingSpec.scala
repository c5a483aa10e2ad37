package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import graft.streaming.AsyncProcessing

object AsyncProcessingSpec {
  val inFlight = new ConcurrentHashMap[String, AtomicBoolean]()
  val violations = new AtomicInteger(0)
  val timeoutCalls = new AtomicInteger(0)
  /** Concurrency gauge: how many guarded bodies are executing right now /
    * the high-water mark. The overlap assertion reads the high-water mark
    * directly instead of inferring overlap from wall time — on container
    * kernels where a thread park/unpark costs ~0.3-1 ms (measured,
    * ChainHandoffProbe) wall time is dominated by handoff scheduling noise
    * and a duration bound flaps.
    */
  val concurrent = new AtomicInteger(0)
  val maxConcurrent = new AtomicInteger(0)
  def guard(key: String)(body: => Unit): Unit = {
    val g = inFlight.computeIfAbsent(key, _ => new AtomicBoolean(false))
    if (!g.compareAndSet(false, true)) violations.incrementAndGet()
    val c = concurrent.incrementAndGet()
    maxConcurrent.accumulateAndGet(c, math.max(_, _))
    try body finally { concurrent.decrementAndGet(); g.set(false) }
  }
}

class AsyncProcessingSpec extends SparkTestBase {

  test("async keyed map overlaps I/O across keys but stays serial within a key") {
    import spark.implicits._
    AsyncProcessingSpec.violations.set(0)
    AsyncProcessingSpec.inFlight.clear()
    AsyncProcessingSpec.concurrent.set(0)
    AsyncProcessingSpec.maxConcurrent.set(0)
    val n = 2000
    val tasks = spark.range(n.toLong).map(i => (s"key-${i % 50}", i))
      .repartition(4, org.apache.spark.sql.functions.col("_1")) // O2: key -> partition
    tasks.count() // warm the session/shuffle outside the timed region

    val t0 = System.nanoTime()
    val out = AsyncProcessing.mapAsyncKeyed(tasks, maxInFlight = 64)(
      _._1,
      { case (k, i) =>
        AsyncProcessingSpec.guard(k)(Thread.sleep(2))
        (k, i * 2)
      }).collect()
    val secs = (System.nanoTime() - t0) / 1e9

    assert(out.length == n)
    assert(AsyncProcessingSpec.violations.get() == 0, "same-key tasks ran concurrently")
    // The overlap claim, asserted on the high-water concurrency gauge: with
    // 50 keys over 4 partitions, cross-key overlap must put well more than a
    // couple of sleeps in flight at once (measured: all 50 chains active).
    // Serial execution would pin the gauge at 1.
    val peak = AsyncProcessingSpec.maxConcurrent.get()
    assert(peak >= 8, s"no I/O overlap: peak concurrent sleeps $peak")
    // generous wall sanity only — NOT the overlap proof (see gauge comment):
    // serial sleep time alone is 4 s; pathological handoff behavior would
    // blow far past this
    assert(secs < 15.0, f"async map pathologically slow: $secs%.1fs for $n x 2ms tasks")
  }

  test("flatMapAsyncKeyed (true-async) keeps per-key serialism and delivers all") {
    import spark.implicits._
    import scala.concurrent.Future
    AsyncProcessingSpec.violations.set(0)
    AsyncProcessingSpec.inFlight.clear()
    val n = 1000
    val tasks = spark.range(n.toLong).map(i => (s"key-${i % 20}", i))
      .repartition(4, org.apache.spark.sql.functions.col("_1"))
    val out = AsyncProcessing.flatMapAsyncKeyed(tasks, maxInFlight = 128)(
      _._1,
      { t =>
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.parasitic
        AsyncProcessing.delayed(2L)(()).map { _ =>
          AsyncProcessingSpec.guard(t._1)(())
          t._2
        }
      }).collect()
    assert(out.length == n)
    assert(out.toSet == (0L until n.toLong).toSet)
    assert(AsyncProcessingSpec.violations.get() == 0)
  }

  test("T4: a never-completing task trips GIVE_UP at the configured timeout; batch completes") {
    import spark.implicits._
    import scala.concurrent.duration._
    import scala.concurrent.{Future, Promise}
    AsyncProcessingSpec.timeoutCalls.set(0)
    val tasks = spark.range(10).map(i => (s"k${i % 3}", i.toLong))
      .repartition(1, org.apache.spark.sql.functions.col("_1"))
    val policy = graft.streaming.CompletionPolicy[(String, Long), (Long, Boolean)](
      timeout = 300.millis,
      onTimeout = (_, _) => { AsyncProcessingSpec.timeoutCalls.incrementAndGet(); graft.streaming.TimeoutDecision.GiveUp },
      onGiveUp = t => (t._2, false)) // error-shaped row: ok = false
    val t0 = System.nanoTime()
    val out = AsyncProcessing.flatMapAsyncKeyed[(String, Long), String, (Long, Boolean)](tasks, maxInFlight = 8, policy)(
      _._1,
      t => if (t._2 == 4L) Promise[(Long, Boolean)]().future // never completes
           else Future.successful((t._2, true)))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(out.length == 10, "batch must complete despite the stuck task")
    assert(out.toSet.contains((4L, false)), "stuck task must surface as an error row")
    assert(out.count(_._2 == false) == 1, "exactly one task gives up")
    assert(AsyncProcessingSpec.timeoutCalls.get() >= 1, "timeout callback must fire")
    assert(secs < 10.0, f"give-up must be prompt, took $secs%.1fs")
    // key k1 (tasks 1,4,7): 7 chains behind stuck 4 — give-up must unblock it
    assert(out.toSet.contains((7L, true)), "successor on the stuck key must still run")
  }

  test("T4: EXTEND grants more time and the task then completes normally") {
    import spark.implicits._
    import scala.concurrent.duration._
    val tasks = spark.range(4).map(i => (s"k$i", i.toLong))
      .repartition(1, org.apache.spark.sql.functions.col("_1"))
    val policy = graft.streaming.CompletionPolicy[(String, Long), Long](
      timeout = 200.millis,
      // extend up to 5 periods (1s total) before giving up
      onTimeout = (_, n) => if (n < 5) graft.streaming.TimeoutDecision.Extend else graft.streaming.TimeoutDecision.GiveUp,
      onGiveUp = _ => -1L)
    val out = AsyncProcessing.mapAsyncKeyed[(String, Long), String, Long](tasks, maxInFlight = 4, policy)(
      _._1,
      t => { if (t._2 == 2L) Thread.sleep(500) ; t._2 }) // needs ~3 extensions
      .collect()
    assert(out.toSet == Set(0L, 1L, 2L, 3L), "extended task must complete, not give up")
  }

  test("T4: a property-bound policy times out executor-side and honors -1 = never") {
    import spark.implicits._
    import scala.concurrent.{Future, Promise}
    import graft.config.{EngineProperties, MapPropertySupplier, Properties}
    // bound at 250 ms from the registry: the stuck task gives up promptly
    val props = new Properties(Seq(new MapPropertySupplier(
      Map("decaton.deferred.complete.timeout.ms" -> 250L))))
    val dyn = props.dynamic(EngineProperties.DeferredCompleteTimeoutMs)
    val policy = graft.streaming.CompletionPolicy.fromProperty[(String, Long), (Long, Boolean)](
      dyn,
      onTimeout = (_, _) => graft.streaming.TimeoutDecision.GiveUp,
      onGiveUp = t => (t._2, false))
    val tasks = spark.range(6).map(i => (s"k${i % 2}", i.toLong))
      .repartition(1, org.apache.spark.sql.functions.col("_1"))
    val out = AsyncProcessing.flatMapAsyncKeyed[(String, Long), String, (Long, Boolean)](
      tasks, maxInFlight = 4, policy)(
      _._1,
      t => if (t._2 == 1L) Promise[(Long, Boolean)]().future
           else Future.successful((t._2, true)))
      .collect()
    assert(out.length == 6 && out.toSet.contains((1L, false)),
      "property-bound timeout must reap the stuck task through the Spark closure")
    // -1 (the reference default) = reaper disabled: nextTimeout is unbounded
    dyn.set(-1L)
    assert(!policy.nextTimeout.isFinite, "-1 must disable the timeout after hot reload")
  }

  test("a task future FAILED with its own TimeoutException propagates (no Extend busy-spin)") {
    import spark.implicits._
    import scala.concurrent.duration._
    import scala.concurrent.Future
    // The async client's internal deadline surfaces as a COMPLETED future
    // failed with TimeoutException — Await.result rethrows it verbatim, so
    // by type it looks exactly like the wall-clock await timeout. An
    // Extend-forever policy must NOT busy-spin on the instantly-rethrown
    // exception: the completed future's failure is the task's real outcome
    // and must propagate like any other failed future.
    val tasks = spark.range(3).map(i => (s"k$i", i.toLong))
      .repartition(1, org.apache.spark.sql.functions.col("_1"))
    val policy = graft.streaming.CompletionPolicy[(String, Long), Long](
      timeout = 100.millis,
      onTimeout = (_, _) => graft.streaming.TimeoutDecision.Extend, // forever
      onGiveUp = _ => -1L)
    val t0 = System.nanoTime()
    val ex = intercept[Exception] {
      AsyncProcessing.flatMapAsyncKeyed[(String, Long), String, Long](
        tasks, maxInFlight = 4, policy)(
        _._1,
        t => if (t._2 == 1L)
               Future.failed(new java.util.concurrent.TimeoutException("client deadline"))
             else Future.successful(t._2))
        .collect()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(ex).exists(_.isInstanceOf[java.util.concurrent.TimeoutException]),
      s"task's own TimeoutException must propagate, got: $ex")
    assert(secs < 30.0, f"Extend policy busy-spun on a completed future: $secs%.1fs")
  }

  test("delayed() with a throwing body fails the future instead of pending forever") {
    import scala.concurrent.duration._
    val boom = new RuntimeException("boom")
    val f = AsyncProcessing.delayed[Int](5L)(throw boom)
    scala.concurrent.Await.ready(f, 5.seconds)
    assert(f.value.exists(_.isFailure), "throwing body must FAIL the future")
    assert(f.value.get.failed.get eq boom)
    // inline-fire path (deadline already due) must behave identically
    val g = AsyncProcessing.delayed[Int](-1000L)(throw boom)
    scala.concurrent.Await.ready(g, 5.seconds)
    assert(g.value.exists(_.isFailure) && (g.value.get.failed.get eq boom))
  }

  test("async keyed map preserves input order within a partition") {
    import spark.implicits._
    val tasks = spark.range(500).map(i => (s"k${i % 7}", i))
      .repartition(2, org.apache.spark.sql.functions.col("_1"))
    // record per-partition input order, compare to output order
    val inOrder = tasks.mapPartitions(it => it.map(_._2)).collect().toSeq
    val outOrder = AsyncProcessing.mapAsyncKeyed(tasks, 32)(_._1, t => t._2).collect().toSeq
    assert(outOrder == inOrder)
  }
}
