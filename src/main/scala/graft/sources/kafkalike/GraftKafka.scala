package graft.sources.kafkalike

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `graft-kafka` — a DataSource-v2 source/sink with Kafka's streaming
  * contract over the file-backed [[BrokerLog]] (S1/S2/O8; the sandbox ships
  * no kafka-sql connector jar, see README "Kafka path"). The Spark-facing
  * surface matches `readStream.format("kafka")` so pipelines swap between the
  * two by changing the format string:
  *
  *  - multi-topic `subscribe` lists ("t,t-retry,t-shaping" — reference
  *    `ConsumeManager.java:121-179`, `ProcessorSubscription.java:219-225`)
  *    and explicit `assign` ({"t":[0,1]}) for static partition assignment;
  *  - Kafka's column schema: key/value/topic/partition/offset/timestamp/
  *    headers (timestampType omitted; headers always included);
  *  - `startingOffsets` earliest|latest, `maxOffsetsPerTrigger` admission
  *    (proportional across partitions, like the Kafka source's rate limit),
  *    checkpointed offsets, and `failOnDataLoss` honored against truncation
  *    (`ProcessorSubscription.receive:107-116` offset-regression analog);
  *  - a write path accepting the Kafka sink shape (`topic`/`key`/`value`/
  *    `headers`, optional explicit `partition`), routing by key hash so the
  *    per-key ordering contract matches the reference's producer.
  *
  * Reads stream records straight from the broker directory per input
  * partition (one Spark partition per topic-partition — the same parallelism
  * contract as the Kafka source); writes produce records one by one with
  * atomic offset claims. Delivery is at-least-once on both sides (a retried
  * task re-produces, exactly like a non-transactional Kafka producer).
  */
class GraftKafkaProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kafka"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = GraftKafka.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftKafkaTable(new CaseInsensitiveStringMap(properties))
}

object GraftKafka {
  /** Kafka source column layout (the `includeHeaders=true` shape, minus
    * timestampType): pipelines written against the real connector read these
    * columns by name.
    */
  val headerType: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", BinaryType, nullable = true)))
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("headers", ArrayType(headerType, containsNull = false), nullable = false)))

  def root(options: CaseInsensitiveStringMap): String = {
    val r = options.get("root")
    require(r != null && r.nonEmpty, "graft-kafka requires the 'root' option (broker directory)")
    r
  }

  /** Resolve the (topic, partition) set from `subscribe` (all partitions) or
    * `assign` (explicit map), exactly one of which must be present for reads.
    */
  def topicPartitions(options: CaseInsensitiveStringMap): Seq[(String, Int)] = {
    val r = root(options)
    val subscribe = Option(options.get("subscribe")).map(_.trim).filter(_.nonEmpty)
    val assign = Option(options.get("assign")).map(_.trim).filter(_.nonEmpty)
    require(subscribe.isDefined ^ assign.isDefined,
      "graft-kafka reads need exactly one of 'subscribe' (comma-separated topics) or 'assign' ({\"topic\":[0,1]})")
    // distinct: "t,t" subscribes or {"t":[0,0]} assigns must not plan a
    // topic-partition twice (duplicate input partitions would double-read
    // every record and double-count the backlog in admission control)
    val tps = subscribe match {
      case Some(topics) =>
        topics.split(",").map(_.trim).filter(_.nonEmpty).toSeq.flatMap { t =>
          (0 until BrokerLog.partitionCount(r, t)).map(p => (t, p))
        }
      case None =>
        val parsed = parseAssign(assign.get)
        // validate like Kafka's assign: an unknown partition fails loudly
        // instead of silently reading an empty directory forever
        parsed.foreach { case (t, p) =>
          val n = BrokerLog.partitionCount(r, t)
          require(p >= 0 && p < n,
            s"assign names partition $p of topic '$t', which has $n partitions (0..${n - 1})")
        }
        parsed
    }
    tps.distinct
  }

  /** Parse the Kafka-style assign JSON `{"topicA":[0,1],"topicB":[2]}`.
    * EVERY topic block must parse: a partially malformed spec (e.g. quoted
    * partition numbers in one block) must fail loudly like Kafka's own
    * assign, not silently read only the well-formed topics forever.
    * An EMPTY partition list (`{"t":[]}`) is a well-formed block assigning
    * zero partitions of that topic — Kafka's assign semantics; a spec whose
    * every block is empty still fails (nothing to read is a config error).
    */
  def parseAssign(s: String): Seq[(String, Int)] = {
    val topicBlock = """"([^"]+)"\s*:\s*\[([0-9,\s]*)\]""".r
    val anyKey = """"([^"]+)"\s*:""".r
    val parsedTopics = topicBlock.findAllMatchIn(s).map(_.group(1)).toSet
    val allKeys = anyKey.findAllMatchIn(s).map(_.group(1)).toSet
    require(parsedTopics.nonEmpty && allKeys == parsedTopics,
      s"could not parse assign spec: $s" +
        (if ((allKeys -- parsedTopics).nonEmpty)
          s" (unparseable topic blocks: ${(allKeys -- parsedTopics).mkString(", ")})"
        else ""))
    val parsed = topicBlock.findAllMatchIn(s).flatMap { m =>
      m.group(2).split(",").map(_.trim).filter(_.nonEmpty)
        .map(p => (m.group(1), p.toInt))
    }.toSeq
    require(parsed.nonEmpty, s"could not parse assign spec: $s")
    parsed
  }
}

/** Streaming offset: per-(topic, partition) next-offset-to-read, serialized
  * as Kafka's checkpoint JSON shape `{"topic":{"0":12,"1":7}}` (sorted, so
  * the string form is deterministic).
  */
case class GraftKafkaOffset(offsets: Map[(String, Int), Long]) extends Offset {
  override def json(): String =
    offsets.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (topic, parts) =>
      val inner = parts.toSeq.map { case ((_, p), off) => (p, off) }.sortBy(_._1)
        .map { case (p, off) => s""""$p":$off""" }.mkString(",")
      // topic names are directory names — quotes/backslashes/control chars
      // are legal there and must not corrupt the line-oriented offset log
      s""""${graft.sources.OffsetJson.escape(topic)}":{$inner}"""
    }.mkString("{", ",", "}")
}

object GraftKafkaOffset {
  /** Inverse of [[GraftKafkaOffset.json]] (topic names JSON-unescaped). */
  def fromJson(s: String): GraftKafkaOffset = {
    val topicBlock = """"((?:[^"\\]|\\.)*)"\s*:\s*\{([^}]*)\}""".r
    val partOff = """"([0-9]+)"\s*:\s*(-?[0-9]+)""".r
    val m = topicBlock.findAllMatchIn(s).flatMap { tb =>
      partOff.findAllMatchIn(tb.group(2)).map { po =>
        (graft.sources.OffsetJson.unescape(tb.group(1)), po.group(1).toInt) -> po.group(2).toLong
      }
    }.toMap
    GraftKafkaOffset(m)
  }
}

class GraftKafkaTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String =
    s"graft-kafka(${Option(options.get("subscribe")).orElse(Option(options.get("assign"))).getOrElse(options.get("topic"))})"
  override def schema(): StructType = GraftKafka.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ,
      TableCapability.STREAMING_WRITE, TableCapability.BATCH_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftKafkaScan(scanOptions)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftKafkaWriteBuilder(info)
}

class GraftKafkaScan(options: CaseInsensitiveStringMap) extends Scan {
  private val root = GraftKafka.root(options)
  private val failOnDataLoss = options.getBoolean("failondataloss", true)

  override def readSchema(): StructType = GraftKafka.schema

  /** Batch read: the full earliest→latest snapshot at planning time (the
    * `spark.read.format("kafka")` analog; used by tests and backfills).
    */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      GraftKafka.topicPartitions(options).map { case (t, p) =>
        val (from, until) = BrokerLog.offsetRange(root, t, p)
        GraftKafkaInputPartition(root, t, p, from, until): InputPartition
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory = new GraftKafkaReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
    // subscribe mode re-enumerates the topics' partitions at every trigger
    // (Kafka's consumer metadata refresh: a partition added by --alter joins
    // the subscription mid-run, read from its earliest offset); assign mode
    // is static by definition
    val subscribed = Option(options.get("subscribe")).map(_.trim).exists(_.nonEmpty)
    val frozen = GraftKafka.topicPartitions(options)
    val so = options.getOrDefault("startingoffsets", "earliest").trim
    // a typo (or the real connector's per-partition JSON form) must not
    // silently mean "earliest" and replay a whole backlog
    require(so.equalsIgnoreCase("earliest") || so.equalsIgnoreCase("latest"),
      s"startingOffsets must be 'earliest' or 'latest', got '$so' " +
        "(per-partition JSON start offsets are not supported by this medium)")
    new GraftKafkaMicroBatchStream(root,
      resolveTps = if (subscribed) () => GraftKafka.topicPartitions(options) else () => frozen,
      startAtLatest = so.equalsIgnoreCase("latest"),
      failOnDataLoss = failOnDataLoss,
      maxOffsetsPerTrigger = Option(options.get("maxoffsetspertrigger")).map { v =>
        require(v.toLong > 0, s"maxOffsetsPerTrigger must be positive, got $v")
        v.toLong
      })
  }
}

class GraftKafkaMicroBatchStream(
    root: String,
    resolveTps: () => Seq[(String, Int)],
    startAtLatest: Boolean,
    failOnDataLoss: Boolean,
    maxOffsetsPerTrigger: Option[Long]) extends MicroBatchStream with SupportsAdmissionControl {

  private def tps: Seq[(String, Int)] = resolveTps()

  private def logRanges: Map[(String, Int), (Long, Long)] =
    tps.map { case (t, p) => (t, p) -> BrokerLog.offsetRange(root, t, p) }.toMap
  private def logEnds: Map[(String, Int), Long] =
    logRanges.map { case (tp, (_, end)) => tp -> end }

  override def initialOffset(): Offset =
    GraftKafkaOffset(tps.map { case (t, p) =>
      val (earliest, latest) = BrokerLog.offsetRange(root, t, p)
      (t, p) -> (if (startAtLatest) latest else earliest)
    }.toMap)

  override def deserializeOffset(json: String): Offset = GraftKafkaOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit =
    maxOffsetsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  // Spark calls the admission-control variant below when the stream
  // implements SupportsAdmissionControl (same contract as the Kafka source)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(Offset, ReadLimit) is used")

  /** Log-end offsets, capped to at most `maxRows` new records distributed
    * proportionally to each partition's backlog (the Kafka source's
    * rate-limit shape — no partition starves, total respects the cap).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startOffs = start.asInstanceOf[GraftKafkaOffset].offsets
    val ranges = logRanges
    lastRanges = Some(ranges)
    val ends = ranges.map { case (tp, (_, e)) => tp -> e }
    // a partition absent from the checkpoint (topic added to the
    // subscription after the checkpoint existed) starts at its EARLIEST
    // available offset — the Kafka source's new-partition rule — and the
    // same default is used by planInputPartitions, so its backlog passes
    // through admission control instead of arriving as one uncapped batch.
    // The EFFECTIVE start is additionally clamped to the earliest available
    // offset: a checkpoint below a truncation point (permissive mode) spans
    // phantom records that must not consume the admission budget — counting
    // them would hand the truncated partition near the whole cap and starve
    // healthy partitions through hundreds of near-empty triggers.
    def startOf(tp: (String, Int)): Long =
      math.max(startOffs.getOrElse(tp, ranges(tp)._1), ranges(tp)._1)
    val capped = limit match {
      case mr: ReadMaxRows =>
        // iterate the SAME snapshot `ranges` was built from: re-resolving tps
        // here could see a partition added between the two enumerations and
        // miss its entry in `ends`
        val avail = ranges.keys.toSeq.sorted.map { tp =>
          tp -> math.max(0L, ends(tp) - startOf(tp))
        }
        val total = avail.map(_._2).sum
        if (total <= mr.maxRows()) ends
        else {
          val scale = mr.maxRows().toDouble / total
          avail.map { case (tp, a) =>
            // floor the proportional share but never to zero for a partition
            // with backlog — a sub-1 share floored to 0 on every partition
            // would re-plan the identical empty batch forever (same
            // don't-starve rule as the Kafka source; the cap may be slightly
            // exceeded, progress is guaranteed)
            val share = if (a == 0L) 0L else math.max(1L, math.floor(a * scale).toLong)
            tp -> (startOf(tp) + share)
          }.toMap
        }
      case _ => ends
    }
    GraftKafkaOffset(capped)
  }

  // progress-reporting reuses the trigger's own scan: a second identical
  // full-broker enumeration per micro-batch bought nothing
  @volatile private var lastRanges: Option[Map[(String, Int), (Long, Long)]] = None
  override def reportLatestOffset(): Offset =
    GraftKafkaOffset(lastRanges.map(_.map { case (tp, (_, e)) => tp -> e }).getOrElse(logEnds))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val startOffs = start.asInstanceOf[GraftKafkaOffset].offsets
    val endOffs = end.asInstanceOf[GraftKafkaOffset].offsets
    endOffs.toSeq.sortBy { case ((t, p), _) => (t, p) }.map { case ((t, p), until) =>
      val earliestAvailable = BrokerLog.offsetRange(root, t, p)._1
      // absent from the checkpoint = partition new to the subscription:
      // start at earliest-available (same default latestOffset uses), which
      // is a legitimate join point, not data loss
      val requested = startOffs.getOrElse((t, p), earliestAvailable)
      val from =
        if (requested >= earliestAvailable) requested
        else if (failOnDataLoss)
          throw new IllegalStateException(
            s"data loss detected on $t/p$p: requested offset $requested but earliest " +
            s"available is $earliestAvailable (records truncated). Set failOnDataLoss=false " +
            "to resume from the earliest available offset.")
        else math.min(earliestAvailable, until)
      GraftKafkaInputPartition(root, t, p, from, math.max(from, until)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new GraftKafkaReaderFactory

  override def commit(end: Offset): Unit = () // progress lives in Spark's checkpoint
  override def stop(): Unit = ()
}

/** One Spark partition per topic-partition slice — the Kafka source's
  * parallelism contract (1000 executors ↔ 1000s of topic partitions).
  */
case class GraftKafkaInputPartition(
    root: String, topic: String, partition: Int, from: Long, until: Long)
  extends InputPartition

class GraftKafkaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftKafkaInputPartition]
    new PartitionReader[InternalRow] {
      // lazy per-record decode: a first batch over a large backlog (no
      // maxOffsetsPerTrigger) must not materialize every record's bytes at
      // reader construction
      private val records = BrokerLog.readLazy(p.root, p.topic, p.partition, p.from, p.until)
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!records.hasNext) false
        else {
          val (off, r) = records.next()
          val headers = new GenericArrayData(r.headers.map { case (k, v) =>
            new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
          }.toArray[Any])
          current = new GenericInternalRow(Array[Any](
            r.key, r.value, UTF8String.fromString(p.topic), p.partition, off,
            r.timestampMillis * 1000L, headers))
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Write side: accepts any row shape containing `value` plus optional
  * `topic` (else the `topic` option), `key`, `partition`, `timestamp`,
  * `headers` — the exact schema `TaskWriter.toKafkaShape` emits and the real
  * Kafka sink accepts. Partition routing: explicit `partition` column wins,
  * else hash(key) % partitions (same-key → same-partition, the ordering
  * contract), else round-robin for null keys.
  */
class GraftKafkaWriteBuilder(info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new Write {
    private val factory = {
      val opts = info.options()
      val schema = info.schema()
      def idx(name: String): Int = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
      // DRIVER-side type validation: ACCEPT_ANY_SCHEMA admits any shape, so
      // a wrong-typed column would otherwise surface as an opaque executor
      // ClassCastException. The real Kafka sink accepts string OR binary
      // key/value (casting strings to UTF-8 bytes) — match that contract.
      def stringOrBinary(i: Int, name: String): Boolean = {
        val dt = schema.fields(i).dataType
        require(dt == BinaryType || dt == StringType,
          s"graft-kafka '$name' must be binary or string, got ${dt.catalogString}")
        dt == StringType
      }
      val vi = idx("value")
      require(vi >= 0, "graft-kafka writes require a 'value' column")
      val ti = idx("topic")
      val defaultTopic = Option(opts.get("topic"))
      require(ti >= 0 || defaultTopic.isDefined,
        "graft-kafka writes need a 'topic' column or the 'topic' option")
      if (ti >= 0) require(schema.fields(ti).dataType == StringType,
        s"graft-kafka 'topic' must be string, got ${schema.fields(ti).dataType.catalogString}")
      val ki = idx("key")
      val pi = idx("partition")
      if (pi >= 0) require(schema.fields(pi).dataType == IntegerType,
        s"graft-kafka 'partition' must be int, got ${schema.fields(pi).dataType.catalogString}")
      val tsi = idx("timestamp")
      if (tsi >= 0) require(
        schema.fields(tsi).dataType == LongType || schema.fields(tsi).dataType == TimestampType,
        s"graft-kafka 'timestamp' must be long or timestamp, got ${schema.fields(tsi).dataType.catalogString}")
      val hi = idx("headers")
      if (hi >= 0) {
        val ok = schema.fields(hi).dataType match {
          case ArrayType(st: StructType, _) =>
            st.fields.length == 2 &&
              st.fields(0).dataType == StringType && st.fields(1).dataType == BinaryType
          case _ => false
        }
        require(ok, "graft-kafka 'headers' must be array<struct<key:string,value:binary>>, " +
          s"got ${schema.fields(hi).dataType.catalogString}")
      }
      GraftKafkaWriterFactory(
        root = GraftKafka.root(opts),
        defaultTopic = defaultTopic,
        topicIdx = ti, keyIdx = ki, valueIdx = vi,
        partitionIdx = pi, timestampIdx = tsi,
        headersIdx = hi,
        timestampIsLong = tsi >= 0 && schema.fields(tsi).dataType == LongType,
        valueIsString = stringOrBinary(vi, "value"),
        keyIsString = ki >= 0 && stringOrBinary(ki, "key"),
        autoCreatePartitions = opts.getInt("autocreatepartitions", 4))
    }
    override def toBatch: BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory = factory
      override def commit(messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(messages: Array[WriterCommitMessage]): Unit = ()
    }
    override def toStreaming: StreamingWrite = new StreamingWrite {
      override def createStreamingWriterFactory(i: PhysicalWriteInfo): StreamingDataWriterFactory = factory
      override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
      override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    }
  }
}

case class GraftKafkaCommitMessage(records: Long) extends WriterCommitMessage

/** Produces records as they arrive — like a non-transactional Kafka
  * producer, a replayed epoch re-produces (at-least-once; the consumer side
  * dedups by design, reference `AtLeastOnceDelivery.java`).
  */
case class GraftKafkaWriterFactory(
    root: String,
    defaultTopic: Option[String],
    topicIdx: Int, keyIdx: Int, valueIdx: Int,
    partitionIdx: Int, timestampIdx: Int, headersIdx: Int,
    timestampIsLong: Boolean,
    valueIsString: Boolean = false,
    keyIsString: Boolean = false,
    autoCreatePartitions: Int)
  extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    writer(partitionId)
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    writer(partitionId)

  private def writer(sparkPartitionId: Int): DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private var written = 0L
    // null-key round-robin seeded by the Spark partition id: every writer
    // starting at 0 would pile each task's first null-key records onto
    // broker partition 0 (Kafka's partitioner randomizes its start for the
    // same reason; the task id keeps it deterministic)
    private var roundRobin = sparkPartitionId
    private val partCounts = scala.collection.mutable.Map.empty[String, Int]
    // next-offset hints per (topic, partition): without them every produce
    // re-scans the partition directory to find the log end — quadratic in
    // partition size for a task writing many records. The claim loop makes
    // a stale hint safe (concurrent producers just probe past collisions).
    private val nextOffset = scala.collection.mutable.Map.empty[(String, Int), Long]

    private def partitionsOf(topic: String): Int =
      partCounts.getOrElseUpdate(topic, {
        if (!BrokerLog.topicExists(root, topic))
          BrokerLog.createTopic(root, topic, autoCreatePartitions)
        BrokerLog.partitionCount(root, topic)
      })

    override def write(row: InternalRow): Unit = {
      val topic =
        if (topicIdx >= 0 && !row.isNullAt(topicIdx)) row.getUTF8String(topicIdx).toString
        else defaultTopic.getOrElse(
          throw new IllegalArgumentException("row has null topic and no 'topic' option set"))
      // string columns cast to UTF-8 bytes, the real Kafka sink's behavior
      def bytesAt(i: Int, isString: Boolean): Array[Byte] =
        if (isString) row.getUTF8String(i).getBytes else row.getBinary(i)
      val key = if (keyIdx >= 0 && !row.isNullAt(keyIdx)) bytesAt(keyIdx, keyIsString) else null
      val value = if (row.isNullAt(valueIdx)) null else bytesAt(valueIdx, valueIsString)
      val ts =
        if (timestampIdx >= 0 && !row.isNullAt(timestampIdx)) {
          if (timestampIsLong) row.getLong(timestampIdx)
          else row.getLong(timestampIdx) / 1000L // TimestampType micros → millis
        } else System.currentTimeMillis()
      val headers: Seq[(String, Array[Byte])] =
        if (headersIdx >= 0 && !row.isNullAt(headersIdx)) {
          val arr = row.getArray(headersIdx)
          (0 until arr.numElements()).map { i =>
            val h = arr.getStruct(i, 2)
            // a null header STRUCT (containsNull=true input schema) would
            // otherwise NPE bare on h.getUTF8String — same clear-error rule
            // as the null header key below
            require(h != null, s"null header struct at headers[$i]")
            val k = h.getUTF8String(0)
            // a clear error beats the bare executor NPE the reference
            // producer also rejects null header keys
            require(k != null, s"null header key at headers[$i]")
            (k.toString, if (h.isNullAt(1)) null else h.getBinary(1))
          }
        } else Nil
      val n = partitionsOf(topic)
      val part =
        if (partitionIdx >= 0 && !row.isNullAt(partitionIdx)) {
          val p = row.getInt(partitionIdx)
          // explicit routing must fail on nonexistent partitions like
          // Kafka's producer — a silent modulo wrap would break any
          // co-partitioning assumption the caller encoded
          require(p >= 0 && p < n,
            s"row routes to partition $p of topic '$topic', which has $n partitions (0..${n - 1})")
          p
        }
        else if (key != null) (util.Arrays.hashCode(key) & Int.MaxValue) % n
        else { roundRobin += 1; math.floorMod(roundRobin - 1, n) }
      val claimed = BrokerLog.produce(root, topic, part,
        BrokerLog.Record(key, value, ts, headers),
        hint = nextOffset.getOrElse((topic, part), -1L))
      nextOffset((topic, part)) = claimed + 1
      written += 1
    }

    override def commit(): WriterCommitMessage = GraftKafkaCommitMessage(written)
    override def abort(): Unit = () // already-produced records stand (at-least-once)
    override def close(): Unit = ()
  }
}
