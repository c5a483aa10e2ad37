package graft

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.sources.kafkalike.{BrokerLog, GraftKafkaOffset}

/** The `graft-kafka` DSv2 source/sink driven through real
  * `spark.read`/`readStream`/`writeStream` calls (VERDICT r3 #1): Kafka
  * column schema, offsets advancing across triggers, admission control,
  * checkpoint resume, and key-routed writes.
  */
object GraftKafkaSourceSpec {
  // (batchId, key, offset, partition, topic) per delivered record
  val delivered = new ConcurrentLinkedQueue[(Long, String, Long, Int, String)]()
  def reset(): Unit = delivered.clear()
}

class GraftKafkaSourceSpec extends SparkTestBase {

  private def freshRoot(): String = Files.createTempDirectory("graft-kafka-spec").toString

  private def produceN(root: String, topic: String, part: Int, n: Int, prefix: String = "k"): Unit =
    (0 until n).foreach { i =>
      BrokerLog.produce(root, topic, part, BrokerLog.Record(
        s"$prefix$i".getBytes, s"v$i".getBytes, 1704067200000L + i,
        Seq("h" -> s"hv$i".getBytes)))
    }

  test("batch read returns Kafka's column schema with real offsets and headers") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "bt", 2)
    produceN(root, "bt", 0, 3)
    produceN(root, "bt", 1, 2)
    val df = spark.read.format("graft-kafka")
      .option("root", root).option("subscribe", "bt").load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("key", "value", "topic", "partition", "offset", "timestamp", "headers"))
    val rows = df.collect()
    assert(rows.length == 5)
    val p0 = rows.filter(_.getAs[Int]("partition") == 0).sortBy(_.getAs[Long]("offset"))
    assert(p0.map(_.getAs[Long]("offset")).toSeq == Seq(0L, 1L, 2L))
    assert(p0.map(r => new String(r.getAs[Array[Byte]]("key"))).toSeq == Seq("k0", "k1", "k2"))
    val hdrs = p0.head.getAs[scala.collection.Seq[Row]]("headers")
    assert(hdrs.map(h => (h.getAs[String]("key"), new String(h.getAs[Array[Byte]]("value")))) ==
      Seq(("h", "hv0")))
    assert(p0.head.getAs[java.sql.Timestamp]("timestamp").getTime == 1704067200000L)
  }

  test("batch write routes by key hash consistently and claims dense offsets") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "wt", 4)
    import spark.implicits._
    val df = spark.range(100).select(
      col("id").cast("string").cast("binary").as("key"),
      concat(lit("payload-"), col("id")).cast("binary").as("value"))
    df.write.format("graft-kafka").mode("append").option("root", root).option("topic", "wt").save()
    // same frame written twice → each key lands on the same partition both times
    df.write.format("graft-kafka").mode("append").option("root", root).option("topic", "wt").save()
    val back = spark.read.format("graft-kafka")
      .option("root", root).option("subscribe", "wt").load()
      .select(col("key").cast("string").as("k"), col("partition")).as[(String, Int)].collect()
    assert(back.length == 200)
    assert(back.groupBy(_._1).forall { case (_, rows) =>
      rows.length == 2 && rows.map(_._2).distinct.length == 1
    }, "a key must always route to the same partition")
    // offsets dense per partition
    (0 until 4).foreach { p =>
      val (from, until) = BrokerLog.offsetRange(root, "wt", p)
      assert(from == 0L && until == back.count(_._2 == p).toLong)
    }
  }

  test("streaming read advances offsets across triggers under maxOffsetsPerTrigger") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "st", 2)
    produceN(root, "st", 0, 8)
    produceN(root, "st", 1, 8)
    GraftKafkaSourceSpec.reset()
    val ckpt = Files.createTempDirectory("graft-kafka-ckpt").toString
    def start() = spark.readStream.format("graft-kafka")
      .option("root", root).option("subscribe", "st")
      .option("maxOffsetsPerTrigger", "6")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.select(col("key").cast("string"), col("offset"), col("partition"), col("topic"))
          .collect().foreach(r => GraftKafkaSourceSpec.delivered.add(
            (id, r.getString(0), r.getLong(1), r.getInt(2), r.getString(3))))
        ()
      }.start()

    val q = start()
    try {
      q.processAllAvailable()
      val got = GraftKafkaSourceSpec.delivered.asScala.toVector
      assert(got.size == 16, s"all 16 records delivered, got ${got.size}")
      // admission control: no micro-batch exceeded the 6-record cap, so the
      // backlog drained over >= 3 triggers with offsets strictly advancing
      val byBatch = got.groupBy(_._1).toSeq.sortBy(_._1)
      assert(byBatch.forall(_._2.size <= 6), s"a batch exceeded maxOffsetsPerTrigger: ${byBatch.map(_._2.size)}")
      assert(byBatch.size >= 3)
      Seq(0, 1).foreach { p =>
        val offs = got.filter(_._4 == p).sortBy(_._1).map(_._3)
        assert(offs == (0L until 8L), s"p$p offsets must advance densely in delivery order: $offs")
      }
    } finally q.stop()

    // restart from checkpoint: only records produced after the stop arrive
    produceN(root, "st", 0, 3, prefix = "late")
    GraftKafkaSourceSpec.reset()
    val q2 = start()
    try {
      q2.processAllAvailable()
      val got = GraftKafkaSourceSpec.delivered.asScala.toVector
      assert(got.map(_._2).sorted == Vector("late0", "late1", "late2"),
        s"resume must deliver exactly the new records, got ${got.map(_._2)}")
      assert(got.map(_._3).sorted == Vector(8L, 9L, 10L))
    } finally q2.stop()
  }

  test("startingOffsets=latest skips the existing backlog") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "lt", 1)
    produceN(root, "lt", 0, 5)
    GraftKafkaSourceSpec.reset()
    val q = spark.readStream.format("graft-kafka")
      .option("root", root).option("subscribe", "lt")
      .option("startingOffsets", "latest")
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-kafka-lt").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.select(col("key").cast("string"), col("offset"), col("partition"), col("topic"))
          .collect().foreach(r => GraftKafkaSourceSpec.delivered.add(
            (id, r.getString(0), r.getLong(1), r.getInt(2), r.getString(3))))
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(GraftKafkaSourceSpec.delivered.isEmpty, "backlog must be skipped at latest")
      produceN(root, "lt", 0, 2, prefix = "new")
      q.processAllAvailable()
      assert(GraftKafkaSourceSpec.delivered.asScala.map(_._2).toSet == Set("new0", "new1"))
    } finally q.stop()
  }

  test("streaming write produces to the broker through writeStream") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "out", 2)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val q = in.toDF().select(
        col("_1").cast("binary").as("key"),
        col("_2").cast("binary").as("value"))
      .writeStream.format("graft-kafka")
      .option("root", root).option("topic", "out")
      .option("checkpointLocation", Files.createTempDirectory("graft-kafka-w").toString)
      .start()
    try {
      in.addData(("a", "1"), ("b", "2"), ("c", "3"))
      q.processAllAvailable()
      val rows = spark.read.format("graft-kafka")
        .option("root", root).option("subscribe", "out").load()
        .select(col("key").cast("string"), col("value").cast("string")).as[(String, String)]
        .collect().toSet
      assert(rows == Set(("a", "1"), ("b", "2"), ("c", "3")))
    } finally q.stop()
  }

  test("assign takes explicit partitions; offset json round-trips") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "as", 4)
    (0 until 4).foreach(p => produceN(root, "as", p, p + 1))
    val df = spark.read.format("graft-kafka")
      .option("root", root).option("assign", """{"as":[1,3]}""").load()
    val parts = df.select("partition").distinct().collect().map(_.getInt(0)).toSet
    assert(parts == Set(1, 3))
    assert(df.count() == 2 + 4)

    val off = GraftKafkaOffset(Map(("t", 0) -> 5L, ("t", 1) -> 7L, ("u", 0) -> 0L))
    assert(GraftKafkaOffset.fromJson(off.json()) == off)
    assert(off.json() == """{"t":{"0":5,"1":7},"u":{"0":0}}""")
  }

  test("a per-trigger cap below the partition count still makes progress (no floor-to-zero starvation)") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "tiny", 4)
    (0 until 4).foreach(p => produceN(root, "tiny", p, 2, prefix = s"p$p-"))
    GraftKafkaSourceSpec.reset()
    val q = spark.readStream.format("graft-kafka")
      .option("root", root).option("subscribe", "tiny")
      .option("maxOffsetsPerTrigger", "2") // < 4 backlogged partitions
      .load()
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-kafka-tiny").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.select(col("key").cast("string"), col("offset"), col("partition"), col("topic"))
          .collect().foreach(r => GraftKafkaSourceSpec.delivered.add(
            (id, r.getString(0), r.getLong(1), r.getInt(2), r.getString(3))))
        ()
      }.start()
    try {
      q.processAllAvailable()
      // a floored share of 0 per partition would re-plan the same empty
      // batch forever and processAllAvailable would return with 0 delivered
      assert(GraftKafkaSourceSpec.delivered.asScala.size == 8,
        s"backlog must fully drain, got ${GraftKafkaSourceSpec.delivered.asScala.size}")
    } finally q.stop()
  }

  test("explicit out-of-range write partitions and unknown assign partitions fail loudly") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "strict", 2)
    import spark.implicits._
    val bad = Seq(("k", "v", 5)).toDF("key", "value", "partition")
      .select(col("key").cast("binary"), col("value").cast("binary"), col("partition"))
    val e = intercept[Exception] {
      bad.write.format("graft-kafka").mode("append")
        .option("root", root).option("topic", "strict").save()
    }
    assert(e.getMessage != null)
    // nothing was silently wrap-routed
    assert(BrokerLog.offsetRange(root, "strict", 0) == (0L, 0L))
    assert(BrokerLog.offsetRange(root, "strict", 1) == (0L, 0L))

    intercept[IllegalArgumentException] {
      spark.read.format("graft-kafka")
        .option("root", root).option("assign", """{"strict":[2]}""").load().collect()
    }
  }

  test("malformed assign, startingOffsets typos and hostile topic names fail or round-trip") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    // a PARTIALLY malformed assign (one well-formed topic, one quoted-number
    // block) must fail loudly, not silently read only the good topic forever
    val e1 = intercept[IllegalArgumentException] {
      graft.sources.kafkalike.GraftKafka.parseAssign("""{"a":[0],"b":["0"]}""")
    }
    assert(e1.getMessage.contains("b"), e1.getMessage)
    // a typo must not silently mean 'earliest' and replay the whole backlog
    val root = freshRoot()
    BrokerLog.createTopic(root, "so", 1)
    val opts = new CaseInsensitiveStringMap(java.util.Map.of(
      "root", root, "subscribe", "so", "startingoffsets", "laitest"))
    val e2 = intercept[IllegalArgumentException] {
      new graft.sources.kafkalike.GraftKafkaScan(opts).toMicroBatchStream("unused")
    }
    assert(e2.getMessage.contains("laitest"), e2.getMessage)
    // topic names are directory names: quotes/backslashes must round-trip
    // the checkpoint JSON instead of corrupting the line-oriented offset log
    val off = GraftKafkaOffset(Map(
      ("he\"llo", 0) -> 5L, ("back\\slash", 1) -> 7L, ("plain", 0) -> 2L))
    assert(GraftKafkaOffset.fromJson(off.json()).offsets == off.offsets,
      s"hostile topic names mangled: ${off.json()}")
  }

  test("string-typed key/value write as UTF-8 bytes; wrong types fail at build") {
    import spark.implicits._
    val root = freshRoot()
    BrokerLog.createTopic(root, "str", 2)
    // the real Kafka sink accepts string key/value and casts to bytes
    Seq(("k1", "v1"), ("k2", "v2")).toDF("key", "value")
      .write.format("graft-kafka").mode("append")
      .option("root", root).option("topic", "str").save()
    val back = spark.read.format("graft-kafka")
      .option("root", root).option("subscribe", "str").load()
      .select(col("key").cast("string"), col("value").cast("string"))
      .as[(String, String)].collect().toSet
    assert(back == Set(("k1", "v1"), ("k2", "v2")), s"string write mangled: $back")
    // a wrong-typed value must fail DRIVER-side with a clear message, not
    // as an executor ClassCastException
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(Option(t.getMessage).getOrElse(""))
    val e = intercept[Exception] {
      Seq(1, 2).toDF("value").write.format("graft-kafka").mode("append")
        .option("root", root).option("topic", "str").save()
    }
    assert((e.getMessage + rootMsg(e)).contains("must be binary or string"),
      s"got: ${e.getMessage} / ${rootMsg(e)}")
    // wrong-SHAPED headers (map instead of array<struct<key,value>>) must
    // also fail driver-side, not as an executor ClassCastException mid-write
    val eh = intercept[Exception] {
      Seq(("k1", "v1")).toDF("key", "value")
        .withColumn("headers", org.apache.spark.sql.functions.map(
          org.apache.spark.sql.functions.lit("hk"), org.apache.spark.sql.functions.lit("hv")))
        .write.format("graft-kafka").mode("append")
        .option("root", root).option("topic", "str").save()
    }
    assert((eh.getMessage + rootMsg(eh)).contains("array<struct<key:string,value:binary>>"),
      s"got: ${eh.getMessage} / ${rootMsg(eh)}")
  }

  test("admission control ignores truncated phantom offsets (no starvation of healthy partitions)") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    import graft.sources.kafkalike.GraftKafkaMicroBatchStream
    val root = freshRoot()
    BrokerLog.createTopic(root, "ph", 2)
    produceN(root, "ph", 0, 10)
    produceN(root, "ph", 1, 10)
    // partition 0's prefix is retention-truncated; a permissive checkpoint
    // still points at 0 — those 8 phantom offsets must not consume budget
    BrokerLog.truncateBefore(root, "ph", 0, 8)
    val stream = new GraftKafkaMicroBatchStream(root,
      resolveTps = () => Seq(("ph", 0), ("ph", 1)),
      startAtLatest = false, failOnDataLoss = false, maxOffsetsPerTrigger = Some(4))
    val start = GraftKafkaOffset(Map(("ph", 0) -> 0L, ("ph", 1) -> 0L))
    val end = stream.latestOffset(start, ReadLimit.maxRows(4))
      .asInstanceOf[GraftKafkaOffset].offsets
    // real backlog: p0 has 2 (offsets 8,9), p1 has 10 → p1 gets the larger
    // share. Unclamped, p0's 10 phantom offsets would halve p1's share AND
    // plan p0 as an empty range below its earliest.
    assert(end(("ph", 1)) >= 3L,
      s"healthy partition starved by phantom backlog: $end")
    assert(end(("ph", 0)) > 8L,
      s"truncated partition must schedule from its earliest, got $end")
  }

  test("duplicate header keys keep the last value through toConsumedRecords (Kafka list contract)") {
    val root = freshRoot()
    BrokerLog.createTopic(root, "dup", 1)
    BrokerLog.produce(root, "dup", 0, BrokerLog.Record(
      "k".getBytes, "v".getBytes, 1704067200000L,
      Seq("h" -> "first".getBytes, "other" -> "x".getBytes, "h" -> "last".getBytes)))
    val recs = graft.sources.TaskSource.toConsumedRecords(
      spark.read.format("graft-kafka").option("root", root).option("subscribe", "dup").load())
      .collect()
    assert(recs.length == 1)
    val h = recs.head.headers
    assert(h.keySet == Set("h", "other"))
    assert(new String(h("h"), "UTF-8") == "last",
      "duplicate header key must resolve to the LAST value (Headers.lastHeader)")
  }
}
