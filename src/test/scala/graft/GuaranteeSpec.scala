package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Spark port of the reference's semantic test harness
  * (`testing/.../processor/ProcessorTestSuite.java:87-123`,
  * `ProcessingGuarantee.java:34-114`): produce a keyed task stream, kill and
  * restart the query mid-run (the rebalance-storm analog), then assert the
  * three delivery guarantees. foreachBatch + checkpoint is at-least-once:
  * replays are legal, loss is not (`AtLeastOnceDelivery.java`,
  * `ProcessOrdering.java`, `SerialProcessing.java`).
  */
object GuaranteeSpec {
  // cross-thread observation log: (key, id) in processing order per key
  val observed = new ConcurrentHashMap[String, java.util.List[Long]]()
  val inFlight = new ConcurrentHashMap[String, AtomicBoolean]()
  val serialViolations = new AtomicInteger(0)

  def reset(): Unit = { observed.clear(); inFlight.clear(); serialViolations.set(0) }

  def record(key: String, id: Long): Unit = {
    val guard = inFlight.computeIfAbsent(key, _ => new AtomicBoolean(false))
    if (!guard.compareAndSet(false, true)) serialViolations.incrementAndGet()
    try {
      observed.computeIfAbsent(key, _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())).add(id)
      Thread.sleep(0, 50000) // widen the race window for the serial check
    } finally guard.set(false)
  }
}

case class KeyedTask(key: String, id: Long, ts: Timestamp)

class GuaranteeSpec extends SparkTestBase {

  test("at-least-once + per-key ordering + serial-per-key across a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    GuaranteeSpec.reset()

    val checkpoint = Files.createTempDirectory("graft-guarantee-ckpt").toString
    val in = MemoryStream[KeyedTask]
    val nKeys = 10
    val total = 400

    def mkQuery() =
      in.toDF().writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // O2: same key → same partition; per-partition FIFO by production order
          batch.repartition(4, col("key"))
            .sortWithinPartitions(col("key"), col("id"))
            .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
              it.foreach(r => GuaranteeSpec.record(r.getAs[String]("key"), r.getAs[Long]("id")))
            }
          ()
        }.start()

    def tasks(from: Int, until: Int): Seq[KeyedTask] =
      (from until until).map(i =>
        KeyedTask(s"key-${i % nKeys}", i.toLong, new Timestamp(1704067200000L + i * 1000L)))

    // phase 1
    var q = mkQuery()
    in.addData(tasks(0, 150))
    q.processAllAvailable()
    // chaos: kill the query mid-stream, enqueue more, restart from checkpoint
    q.stop()
    in.addData(tasks(150, 300))
    q = mkQuery()
    in.addData(tasks(300, total))
    q.processAllAvailable()
    q.stop()

    // AT_LEAST_ONCE_DELIVERY: every produced id observed at least once
    val seen = GuaranteeSpec.observed.values().asScala.flatMap(_.asScala).toSet
    assert((0L until total.toLong).forall(seen.contains), {
      val missing = (0L until total.toLong).filterNot(seen.contains)
      s"lost tasks: ${missing.take(10)}"
    })

    // PROCESS_ORDERING (ProcessingGuarantee.java:44-72): per key, the observed
    // sequence must be a concatenation of non-decreasing runs (replay legal),
    // and every id's predecessors (same key) must be observed by the end.
    GuaranteeSpec.observed.asScala.foreach { case (key, list) =>
      val ids = list.asScala.toVector
      val keyIds = (0L until total.toLong).filter(i => s"key-${i % nKeys}" == key)
      assert(ids.toSet == keyIds.toSet, s"$key missing ids")
      // non-decreasing within each replay run: a decrease marks a replay
      // restart, which must restart from a previously-seen id
      var prev = Long.MinValue
      val seenSoFar = scala.collection.mutable.Set[Long]()
      ids.foreach { id =>
        if (id < prev)
          assert(seenSoFar.contains(id), s"$key replayed unseen id $id (order violation)")
        seenSoFar += id
        prev = id
      }
    }

    // SERIAL_PROCESSING: no same-key concurrency observed
    assert(GuaranteeSpec.serialViolations.get() == 0,
      s"${GuaranteeSpec.serialViolations.get()} same-key concurrent executions")
  }

  test("effectively-once sink: batch-id-keyed writes stay exact across a FORCED replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft-eo-ckpt").toString
    val out = Files.createTempDirectory("graft-eo-out").toString
    val in = MemoryStream[KeyedTask]
    val total = 200
    def mk() = graft.streaming.StreamOps.effectivelyOnceParquet(in.toDF(), out, ckpt)

    var q = mk()
    in.addData((0 until 120).map(i =>
      KeyedTask(s"key-${i % 7}", i.toLong, new Timestamp(1704067200000L + i * 1000L))))
    q.processAllAvailable()
    in.addData((120 until total).map(i =>
      KeyedTask(s"key-${i % 7}", i.toLong, new Timestamp(1704067200000L + i * 1000L))))
    q.processAllAvailable()
    q.stop()

    // force an at-least-once replay: drop the LAST commit marker, so the
    // restarted query re-executes that batch with the SAME batch id
    val commitsDir = new java.io.File(s"$ckpt/commits")
    val last = commitsDir.listFiles().map(_.getName).filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commitsDir, last.toString).delete(), "failed to drop commit marker")
    // also drop the checksum shadow, or the re-commit's rename fails and is
    // misread as a concurrent query on the same checkpoint
    new java.io.File(commitsDir, s".$last.crc").delete()

    q = mk()
    q.processAllAvailable()
    q.stop()

    // the batch really was re-executed: its commit marker is back
    assert(new java.io.File(commitsDir, last.toString).exists,
      "restart did not replay the uncommitted batch — the test lost its bite")
    // and the replayed batch overwrote itself: the sink is EXACT, not at-least-once
    val got = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(got.toSeq === (0L until total.toLong),
      s"sink has ${got.length} rows for $total inputs — replay duplicated or lost data")
  }
}
