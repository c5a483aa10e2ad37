package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.kafkalike.BrokerLog
import graft.sources.kafkalike.BrokerLog.Record

/** The broker storage layer behind `graft-kafka` (VERDICT r3 #2): wire-format
  * round-trip, dense offsets under racing producers (the createLink claim),
  * and Kafka's never-regressing log-end offset across retention / full
  * truncation — the property `failOnDataLoss` detection depends on.
  */
class BrokerLogSpec extends AnyFunSuite {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-brokerlog").toString

  private def rec(k: String, v: String, ts: Long = 42L,
      headers: Seq[(String, Array[Byte])] = Nil): Record =
    Record(if (k == null) null else k.getBytes("UTF-8"),
      if (v == null) null else v.getBytes("UTF-8"), ts, headers)

  test("encode/decode round-trips randomized records, incl. null key/value and headers") {
    val rnd = new Random(7)
    (0 until 200).foreach { _ =>
      val key = if (rnd.nextInt(5) == 0) null else Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
      val value = if (rnd.nextInt(7) == 0) null else Array.fill(rnd.nextInt(256))(rnd.nextInt().toByte)
      val headers = (0 until rnd.nextInt(4)).map { i =>
        (s"h$i-${rnd.nextInt(100)}", Array.fill(rnd.nextInt(32))(rnd.nextInt().toByte))
      }
      val r = Record(key, value, rnd.nextLong(), headers)
      val back = BrokerLog.decode(BrokerLog.encode(r))
      assert((back.key == null) == (r.key == null))
      if (r.key != null) assert(back.key.sameElements(r.key))
      assert((back.value == null) == (r.value == null))
      if (r.value != null) assert(back.value.sameElements(r.value))
      assert(back.timestampMillis == r.timestampMillis)
      assert(back.headers.map(_._1) == r.headers.map(_._1))
      assert(back.headers.zip(r.headers).forall { case ((_, a), (_, b)) => a.sameElements(b) })
    }
  }

  test("produce assigns dense offsets; read returns the requested range in order") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "t", 2)
    val offs = (0 until 10).map(i => BrokerLog.produce(root, "t", i % 2, rec(s"k$i", s"v$i")))
    assert(offs.grouped(2).toSeq.transpose.forall(_ == Seq(0L, 1L, 2L, 3L, 4L)))
    assert(BrokerLog.offsetRange(root, "t", 0) == (0L, 5L))
    val got = BrokerLog.read(root, "t", 0, 1L, 4L)
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.map(r => new String(r._2.value, "UTF-8")) == Seq("v2", "v4", "v6"))
  }

  test("racing producers: offsets stay dense, no record lost or overwritten") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "race", 1)
    val nThreads = 8
    val perThread = 50
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val futures = (0 until nThreads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          start.await()
          (0 until perThread).map(i => BrokerLog.produce(root, "race", 0, rec(s"t$t", s"$t-$i")))
        }
      })
    }
    start.countDown()
    val claimed = futures.flatMap(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    val total = nThreads * perThread
    // dense + unique: every offset 0..total-1 claimed exactly once
    assert(claimed.sorted == (0L until total.toLong))
    assert(BrokerLog.offsetRange(root, "race", 0) == (0L, total.toLong))
    // no overwrite: all produced payloads present exactly once
    val bodies = BrokerLog.read(root, "race", 0, 0L, total.toLong)
      .map(r => new String(r._2.value, "UTF-8"))
    assert(bodies.size == total && bodies.toSet.size == total)
  }

  test("retention keeps surviving offsets stable; full truncation preserves log-end (Kafka contract)") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "ret", 1)
    (0 until 10).foreach(i => BrokerLog.produce(root, "ret", 0, rec(s"k$i", s"v$i")))
    BrokerLog.truncateBefore(root, "ret", 0, 6L)
    // prefix gone, remaining offsets untouched
    assert(BrokerLog.offsetRange(root, "ret", 0) == (6L, 10L))
    assert(BrokerLog.read(root, "ret", 0, 0L, 100L).map(_._1) == Seq(6L, 7L, 8L, 9L))
    // data loss: everything deleted — log-end must NOT regress to (0, 0)
    BrokerLog.truncateBefore(root, "ret", 0, 100L)
    assert(BrokerLog.offsetRange(root, "ret", 0) == (10L, 10L),
      "after full truncation the range must report the persisted high water, not (0, 0)")
    // the next produce continues at 10, never re-claiming offset 0
    assert(BrokerLog.produce(root, "ret", 0, rec("k", "fresh")) == 10L)
  }

  test("log-end survives full truncation even under racing producers (marker monotonicity)") {
    // the single-file high-water scheme raced: a stale laggard's replace
    // could overwrite a higher mark and both writers exited satisfied; the
    // create-only marker scheme makes regression structurally impossible —
    // race many producers, then truncate EVERYTHING and check the mark
    val root = freshRoot()
    BrokerLog.createTopic(root, "hw", 1)
    val nThreads = 8
    val perThread = 25
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val futures = (0 until nThreads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = {
          start.await()
          (0 until perThread).foreach(i => BrokerLog.produce(root, "hw", 0, rec(s"t$t", s"$t-$i")))
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    val total = (nThreads * perThread).toLong
    BrokerLog.truncateBefore(root, "hw", 0, Long.MaxValue)
    assert(BrokerLog.offsetRange(root, "hw", 0) == (total, total),
      "racing bumps must never leave a regressed log-end mark")
    assert(BrokerLog.produce(root, "hw", 0, rec("k", "fresh")) == total)
  }

  test("createTopic is idempotent; partition-count change is rejected") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "t2", 3)
    BrokerLog.createTopic(root, "t2", 3) // ok
    intercept[IllegalArgumentException](BrokerLog.createTopic(root, "t2", 4))
    assert(BrokerLog.partitionCount(root, "t2") == 3)
    assert(BrokerLog.topicExists(root, "t2"))
    assert(!BrokerLog.topicExists(root, "nope"))
  }

  test("a stale produce hint below a retention truncation cannot claim a truncated offset") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "tr", 1)
    var hint = -1L
    (0 until 20).foreach { i =>
      val c = BrokerLog.produce(root, "tr", 0, Record(null, s"v$i".getBytes, i.toLong, Seq.empty), hint)
      hint = c + 1
    }
    // writer idles with hint=11 (its last claim was 10); others advance the
    // log (done above), then retention truncates the prefix
    val staleHint = 11L
    BrokerLog.truncateBefore(root, "tr", 0, 15)
    assert(BrokerLog.offsetRange(root, "tr", 0) == (15L, 20L))
    // slot 11 is free (deleted) — a naive hinted claim would land THERE,
    // below earliest=15: invisible to consumers positioned past the
    // truncation point and a regression of the earliest bound
    val claimed = BrokerLog.produce(root, "tr", 0,
      Record(null, "late".getBytes, 99L, Seq.empty), staleHint)
    assert(claimed == 20L, s"stale hint claimed a truncated slot: offset $claimed")
    assert(BrokerLog.offsetRange(root, "tr", 0) == (15L, 21L),
      "earliest must not regress after a hinted produce")
    assert(BrokerLog.read(root, "tr", 0, 20L, 21L).map(r => new String(r._2.value)) == Seq("late"))
    // a trusted hint (anchor record still present) still skips the scan path:
    // claims from it remain dense at the log end
    val c2 = BrokerLog.produce(root, "tr", 0, Record(null, "next".getBytes, 100L, Seq.empty), claimed + 1)
    assert(c2 == 21L)
  }
}
