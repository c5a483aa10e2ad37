package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.ConsumedRecord

/** Sources that yield the ConsumedRecord shape (S1).
  *
  * In production this is Spark's Kafka source — `readStream.format("kafka")
  * .option("subscribe", "t,t-retry,t-shaping")` already provides multi-topic
  * subscribe, offset tracking and back-pressure (reference
  * `ConsumeManager.java:121-179` re-expressed as source options; SURVEY.md
  * §2.1). The kafka-sql connector jar is not in this container, so the same
  * streaming contract executes through the in-repo
  * [[graft.sources.kafkalike.GraftKafkaProvider graft-kafka]] DataSource-v2
  * source ([[brokerStream]]) — swapping to real Kafka is a format-string
  * change, the options and column schema are identical.
  */
object TaskSource {

  /** A RUNNING multi-topic task stream over the file-backed broker: the
    * `readStream.format("kafka")` analog with identical options
    * ([[kafkaOptions]]) and Kafka's column schema. Offsets are checkpointed
    * by Spark; back-pressure via `maxOffsetsPerTrigger`.
    */
  def brokerStream(
      spark: SparkSession,
      brokerRoot: String,
      originTopic: String,
      retryTopic: Option[String] = None,
      shapingTopics: Seq[String] = Nil,
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false,
      properties: Option[graft.config.Properties] = None): DataFrame = {
    val cap = admissionCap(maxOffsetsPerTrigger, properties)
    spark.readStream.format("graft-kafka")
      .option("root", brokerRoot)
      .options(kafkaOptions(originTopic, retryTopic, shapingTopics, cap)
        .updated("failOnDataLoss", failOnDataLoss.toString))
      .load()
  }

  /** Admission-cap precedence: an explicit `maxOffsetsPerTrigger` wins; else
    * a supplied property registry contributes `decaton.max.poll.records`
    * (the cap the reference FORCES onto every consumer it builds,
    * `ConsumerSupplier.java:57-61`, default 100) as the per-trigger bound;
    * else unbounded. Per-poll in the reference ≈ per-trigger here: both are
    * the unit of intake between commit points.
    */
  def admissionCap(
      explicit: Option[Long],
      properties: Option[graft.config.Properties]): Option[Long] =
    explicit.orElse(
      properties.map(_.resolve(graft.config.EngineProperties.MaxPollRecords).toLong))

  /** Kafka-schema frame (array-of-struct headers, TIMESTAMP) → the engine's
    * [[ConsumedRecord]] shape (map headers, epoch millis).
    */
  def toConsumedRecords(df: DataFrame): Dataset[ConsumedRecord] = {
    import df.sparkSession.implicits._
    df.select(
      col("topic"), col("partition"), col("offset"),
      unix_millis(col("timestamp")).as("timestampMillis"),
      col("key"), col("value"),
      // Kafka headers may repeat a key (the header contract is a LIST);
      // the map projection keeps the LAST value per key, matching Kafka's
      // own Headers.lastHeader convention — a bare map_from_entries throws
      // DUPLICATE_MAP_KEY and kills the query on the first such record
      aggregate(
        col("headers"),
        map().cast("map<string,binary>"),
        (acc, h) => map_concat(
          map_filter(acc, (k, _) => k =!= h.getField("key")),
          map_from_entries(array(struct(
            h.getField("key").as("key"), h.getField("value").as("value"))))))
        .as("headers"))
      .as[ConsumedRecord]
  }

  /** Kafka source options equivalent to the reference consumer setup:
    * origin + retry (+ shaping) topics in one subscription
    * (`ProcessorSubscription.java:219-225`), bounded per-trigger intake in
    * place of `max.poll.records` (`ConsumerSupplier.java:30-48` forces
    * auto-commit off — Spark never auto-commits, progress is checkpointed).
    */
  def kafkaOptions(
      originTopic: String,
      retryTopic: Option[String],
      shapingTopics: Seq[String],
      maxOffsetsPerTrigger: Option[Long]): Map[String, String] = {
    val topics = (Seq(originTopic) ++ retryTopic.toSeq ++ shapingTopics).mkString(",")
    Map("subscribe" -> topics, "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString)
  }

  /** Batch surrogate of the Kafka source: the TESTDATA `events` table as a
    * keyed task stream. key = user id bytes, value = props payload bytes,
    * event_id stands in for the offset. Used by the correctness gate, which
    * has no Kafka broker.
    */
  def fromEvents(spark: SparkSession, sfDir: String): Dataset[ConsumedRecord] = {
    import spark.implicits._
    Tables.events(spark, sfDir)
      .select(
        lit("events").as("topic"),
        (col("user_id") % 32).cast("int").as("partition"),
        col("event_id").as("offset"),
        unix_millis(col("ts")).as("timestampMillis"),
        col("user_id").cast("string").cast("binary").as("key"),
        col("props").cast("binary").as("value"),
        map(lit("event_type"), col("event_type").cast("binary")).as("headers"))
      .as[ConsumedRecord]
  }
}
