package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.kafkalike.BrokerLog

/** The reference's multi-instance rebalance storm
  * (`ProcessorTestSuite.java:102+`: 3 instances × 8 partitions, mid-run
  * restarts), through REAL concurrent `readStream.format("graft-kafka")`
  * queries sharing one topic. Three "processor instances" take static
  * partition assignments (the `assign` option — disjoint sets covering all 8
  * partitions), 10k keyed tasks are produced through the graft-kafka sink
  * (key-hash routing, per-key production order preserved), one instance is
  * killed mid-run and restarted from its checkpoint (the
  * rebalance-onPartitionsRevoked/Assigned analog), and the three delivery
  * guarantees are asserted exactly as GuaranteeSpec does for one instance:
  * at-least-once, per-key order modulo replay, serial-per-key.
  */
object RebalanceStormSpec {
  val observed = new ConcurrentHashMap[String, java.util.List[Long]]()
  val inFlight = new ConcurrentHashMap[String, AtomicBoolean]()
  val serialViolations = new AtomicInteger(0)

  def reset(): Unit = { observed.clear(); inFlight.clear(); serialViolations.set(0) }

  def record(key: String, id: Long): Unit = {
    val guard = inFlight.computeIfAbsent(key, _ => new AtomicBoolean(false))
    if (!guard.compareAndSet(false, true)) serialViolations.incrementAndGet()
    try {
      observed.computeIfAbsent(key,
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Long]())).add(id)
      Thread.sleep(0, 50000) // widen the race window for the serial check
    } finally guard.set(false)
  }
}

class RebalanceStormSpec extends SparkTestBase {

  test("3 instances × 8 partitions: restart one mid-run, all guarantees hold over 10k tasks") {
    import spark.implicits._
    RebalanceStormSpec.reset()

    val root = Files.createTempDirectory("graft-storm").toString
    val topic = "storm"
    val nPartitions = 8
    val nKeys = 200
    val total = 10000
    BrokerLog.createTopic(root, topic, nPartitions)

    // instance → static partition assignment (disjoint, covering all 8)
    val assignments = Seq("""{"storm":[0,1,2]}""", """{"storm":[3,4,5]}""", """{"storm":[6,7]}""")
    val checkpoints = assignments.map(_ => Files.createTempDirectory("graft-storm-ckpt").toString)

    def produce(from: Int, until: Int): Unit =
      spark.range(from, until).select(
          concat(lit("key-"), col("id") % nKeys).cast("binary").as("key"),
          col("id").cast("string").cast("binary").as("value"))
        // per-key production order: one writer task per key, rows in id order
        .repartition(4, col("key")).sortWithinPartitions(col("key"), col("value").cast("string").cast("long"))
        .write.format("graft-kafka").mode("append")
        .option("root", root).option("topic", topic).save()

    def startInstance(i: Int) =
      spark.readStream.format("graft-kafka")
        .option("root", root).option("assign", assignments(i))
        .load()
        .writeStream.option("checkpointLocation", checkpoints(i))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          // O2 key-hash subpartitioning + per-key offset order inside the batch
          batch.select(col("key").cast("string").as("k"),
              col("value").cast("string").cast("long").as("id"), col("offset"))
            .repartition(4, col("k")).sortWithinPartitions(col("k"), col("offset"))
            .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
              it.foreach(r => RebalanceStormSpec.record(r.getAs[String]("k"), r.getAs[Long]("id")))
            }
          ()
        }.start()

    produce(0, 4000)
    val queries = scala.collection.mutable.ArrayBuffer(
      startInstance(0), startInstance(1), startInstance(2))
    try {
      queries.foreach(_.processAllAvailable())
      // the storm: kill instance 1 mid-run, keep producing while it is down
      queries(1).stop()
      produce(4000, 8000)
      queries(0).processAllAvailable()
      queries(2).processAllAvailable()
      // restart from its checkpoint (rebalance recovery), produce the rest
      queries(1) = startInstance(1)
      produce(8000, total)
      queries.foreach(_.processAllAvailable())

      // AT_LEAST_ONCE_DELIVERY across all instances
      val seen = RebalanceStormSpec.observed.values().asScala.flatMap(_.asScala).toSet
      assert(seen.size >= total && (0L until total.toLong).forall(seen.contains), {
        val missing = (0L until total.toLong).filterNot(seen.contains)
        s"lost tasks: ${missing.take(10)} (of ${missing.size})"
      })

      // PROCESS_ORDERING per key, replay-tolerant (GuaranteeSpec's rule):
      // ids per key were produced in increasing order onto one partition, so
      // observation order must be non-decreasing runs restarting only at
      // already-seen ids
      RebalanceStormSpec.observed.asScala.foreach { case (key, list) =>
        val ids = list.asScala.toVector
        var prev = Long.MinValue
        val seenSoFar = scala.collection.mutable.Set[Long]()
        ids.foreach { id =>
          if (id < prev)
            assert(seenSoFar.contains(id), s"$key replayed unseen id $id (order violation)")
          seenSoFar += id
          prev = id
        }
      }

      // SERIAL_PROCESSING: no same-key concurrency across the 3 instances
      assert(RebalanceStormSpec.serialViolations.get() == 0,
        s"${RebalanceStormSpec.serialViolations.get()} same-key concurrent executions")
    } finally queries.foreach(q => if (q.isActive) q.stop())
  }
}
