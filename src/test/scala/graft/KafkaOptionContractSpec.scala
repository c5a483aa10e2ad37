package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TaskSource

/** Machine-checks the S1/S2 claim that [[TaskSource.kafkaOptions]] emits
  * option keys the REAL `spark-sql-kafka` source accepts — the drift this
  * guards against is a silently-ignored option name (Spark's Kafka source
  * reads options case-insensitively and ignores unknown keys, so a typo'd
  * `maxOffsetPerTrigger` would disable admission control without an error).
  *
  * Two tiers, no broker needed:
  *   1. when `org.apache.spark.sql.kafka010.KafkaSourceProvider` is on the
  *      classpath (a real deployment), the accepted set is harvested from
  *      the provider object's own String constants by reflection;
  *   2. in this sandbox (zero egress, connector jar absent) the check runs
  *      against a PINNED registry transcribed from the public Spark source —
  *      `connector/kafka-0-10-sql/.../KafkaSourceProvider.scala` (Spark
  *      4.x) — so the contract is still machine-checked, just against a
  *      copy that a Spark upgrade must re-pin.
  */
class KafkaOptionContractSpec extends AnyFunSuite {

  /** Source-reading option keys of the real provider, lowercase (the
    * provider wraps options in CaseInsensitiveMap). Transcribed from the
    * public Spark source: KafkaSourceProvider.scala object constants
    * (ASSIGN/SUBSCRIBE/SUBSCRIBE_PATTERN strategy keys,
    * STARTING/ENDING_OFFSETS* keys, FAIL_ON_DATA_LOSS_OPTION_KEY,
    * MAX/MIN_OFFSET_PER_TRIGGER, MAX_TRIGGER_DELAY, MIN_PARTITIONS,
    * GROUP_ID_PREFIX, INCLUDE_HEADERS, CONSUMER_POLL_TIMEOUT,
    * fetchOffset retry knobs) plus the sink's TOPIC_OPTION_KEY.
    */
  private val pinnedAccepted: Set[String] = Set(
    "assign", "subscribe", "subscribepattern",
    "startingoffsets", "endingoffsets",
    "startingoffsetsbytimestamp", "endingoffsetsbytimestamp",
    "startingtimestamp", "endingtimestamp",
    "startingoffsetsbytimestampstrategy",
    "failondataloss",
    "maxoffsetspertrigger", "minoffsetspertrigger", "maxtriggerdelay",
    "minpartitions", "maxrecordsperpartition",
    "groupidprefix", "includeheaders",
    "kafkaconsumer.polltimeoutms",
    "fetchoffset.numretries", "fetchoffset.retryintervalms",
    "topic")

  /** Options the real provider REJECTS with an IllegalArgumentException
    * (KafkaSourceProvider.validateGeneralOptions / the forced consumer
    * params): Spark owns group ids, offset resets, deserializers and
    * auto-commit — exactly the settings the reference's ConsumerSupplier
    * forces (`ConsumerSupplier.java:30-48`). Our S2 posture is to emit NONE
    * of them and let the engine's own forcing stand.
    */
  private val pinnedForbidden: Set[String] = Set(
    "kafka.group.id", "kafka.auto.offset.reset", "kafka.enable.auto.commit",
    "kafka.key.deserializer", "kafka.value.deserializer",
    "kafka.interceptor.classes")

  /** Keys the graft-kafka simulation reads (GraftKafka.scala) — the
    * sandbox tier must stay option-compatible with the real source so a
    * user can swap `format("kafka")` for `format("graft-kafka")` in tests.
    * `root` is the simulation's broker directory, its one extra knob.
    */
  private val graftKafkaAccepted: Set[String] = Set(
    "root", "assign", "subscribe", "topic",
    "startingoffsets", "failondataloss", "maxoffsetspertrigger")

  private def reflectiveRegistry(): Option[Set[String]] =
    try {
      val cls = Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider$")
      val module = cls.getField("MODULE$").get(null)
      // harvest every no-arg String accessor on the provider object whose
      // value looks like an option key (lowercase-able identifier)
      val keys = cls.getDeclaredMethods.toSeq
        .filter(m => m.getParameterCount == 0 && m.getReturnType == classOf[String])
        .flatMap { m =>
          m.setAccessible(true)
          scala.util.Try(m.invoke(module).asInstanceOf[String]).toOption
        }
        .filter(v => v != null && v.nonEmpty && v.matches("[A-Za-z][A-Za-z0-9._]*"))
        .map(_.toLowerCase(java.util.Locale.ROOT))
        .toSet
      if (keys.nonEmpty) Some(keys) else None
    } catch { case _: ClassNotFoundException | _: NoSuchFieldException => None }

  private val emitted: Map[String, String] = TaskSource.kafkaOptions(
    originTopic = "tasks",
    retryTopic = Some("tasks-retry"),
    shapingTopics = Seq("tasks-shaping"),
    maxOffsetsPerTrigger = Some(1000L))

  test("every emitted option key is in the real source's accepted registry (S1/S2)") {
    val (registry, tier) = reflectiveRegistry() match {
      case Some(r) => (r, "reflective (connector on classpath)")
      case None => (pinnedAccepted, "pinned from the public Spark source")
    }
    info(s"registry tier: $tier (${registry.size} keys)")
    emitted.keys.foreach { k =>
      assert(registry.contains(k.toLowerCase(java.util.Locale.ROOT)),
        s"emitted option '$k' is not in the real Kafka source's registry — " +
          "it would be silently ignored on a real cluster")
    }
  }

  test("no emitted option is one the real source rejects (S2 forced config)") {
    emitted.keys.foreach { k =>
      assert(!pinnedForbidden.contains(k.toLowerCase(java.util.Locale.ROOT)),
        s"emitted option '$k' is force-owned by Spark's Kafka engine and " +
          "would throw at stream start")
    }
  }

  test("emitted options stay within the graft-kafka simulation's surface") {
    emitted.keys.foreach { k =>
      assert(graftKafkaAccepted.contains(k.toLowerCase(java.util.Locale.ROOT)),
        s"emitted option '$k' is not read by graft-kafka — the simulation " +
          "tier would silently diverge from the real source")
    }
  }

  test("emitted option values parse under the real source's contracts") {
    // subscribe: non-empty comma-separated topic list, no blanks
    val topics = emitted("subscribe").split(",")
    assert(topics.nonEmpty && topics.forall(t => t.trim.nonEmpty && t == t.trim),
      s"subscribe value malformed: '${emitted("subscribe")}'")
    assert(topics.toSeq == Seq("tasks", "tasks-retry", "tasks-shaping"),
      "subscription must list origin, retry and shaping topics in order " +
        "(ProcessorSubscription.java:219-225)")
    // failOnDataLoss: strict boolean
    assert(Set("true", "false").contains(emitted("failOnDataLoss")),
      s"failOnDataLoss must be a boolean literal: '${emitted("failOnDataLoss")}'")
    // maxOffsetsPerTrigger: positive long
    assert(emitted("maxOffsetsPerTrigger").toLong > 0L,
      "maxOffsetsPerTrigger must parse as a positive long")
    // no option needs the kafka. passthrough prefix
    assert(emitted.keys.forall(!_.startsWith("kafka.")),
      "engine-level options must not use the kafka. consumer-config prefix")
  }
}
