package graft.config

import java.util.concurrent.atomic.AtomicReference

/** P1/P2 — the typed property "control plane"
  * (`ProcessorProperties.java:46-272`, `PropertyDefinition.java`,
  * `DynamicProperty.java:31-70`, precedence
  * `SubscriptionBuilder.addProperties:144-149`).
  *
  * A [[PropertyDefinition]] carries name, default and validator; suppliers
  * are consulted in registration order and the first one providing a value
  * wins; [[DynamicProperty]] holds a hot-swappable value whose listeners fire
  * on change — in Spark terms, a broadcast-refresh or trigger-boundary
  * reconfiguration (query restart for structural knobs).
  */
final case class PropertyDefinition[T](
    name: String,
    default: T,
    validator: T => Boolean = (_: T) => true) {
  def validate(v: T): T = {
    require(validator(v), s"invalid value for $name: $v")
    v
  }
}

trait PropertySupplier {
  /** Some(value) if this supplier provides the property. */
  def get[T](definition: PropertyDefinition[T]): Option[T]
}

/** In-memory supplier. Values are coerced to the definition's type the same
  * way the file supplier parses raw strings: an `Int` supplied for a `Long`
  * property widens, numeric/boolean strings parse, and a value that cannot
  * be coerced behaves as UNSET (resolve falls back to lower-precedence
  * suppliers / the default) rather than throwing a `ClassCastException` at
  * validate time — [[validateAll]] reports the un-coercible entry.
  */
final class MapPropertySupplier(values: Map[String, Any]) extends PropertySupplier {
  def get[T](d: PropertyDefinition[T]): Option[T] =
    values.get(d.name).flatMap { raw =>
      try Some(MapPropertySupplier.coerce(raw, d.default).asInstanceOf[T])
      catch { case _: Exception => None }
    }

  /** One message per entry that is unknown, un-coercible, or fails its
    * definition's validator (the polling suppliers' validateAll contract).
    */
  def validateAll(defs: Seq[PropertyDefinition[_]]): Seq[String] = {
    val byName = defs.map(d => d.name -> d).toMap
    values.toSeq.sortBy(_._1).flatMap { case (k, raw) =>
      byName.get(k) match {
        case None => Seq(s"unknown property '$k' (not in the published schema)")
        case Some(d) =>
          try {
            d.asInstanceOf[PropertyDefinition[Any]]
              .validate(MapPropertySupplier.coerce(raw, d.default))
            Nil
          } catch {
            case e: Exception => Seq(s"property '$k'='$raw' invalid: ${e.getMessage}")
          }
      }
    }
  }
}

object MapPropertySupplier {
  /** Coerce `raw` to the runtime shape of `like` (a definition default) or
    * throw with a loud message. Widening (Int→Long) and narrowing-in-range
    * (Long→Int) are accepted; strings parse by the target type; anything
    * else must already be an instance of the target's class.
    */
  private[config] def coerce(raw: Any, like: Any): Any = (raw, like) match {
    case (v: Int, _: Long)                   => v.toLong
    case (v: Long, _: Int) if v.isValidInt   => v.toInt
    case (s: String, _: Long)                => s.trim.toLong
    case (s: String, _: Int)                 => s.trim.toInt
    case (s: String, _: Boolean)             => s.trim.toBoolean
    case (v: Seq[_], _: Seq[_])              => v
    case (v, l) if l.getClass.isInstance(v)  => v
    case (v, l) =>
      throw new IllegalArgumentException(
        s"cannot coerce ${v.getClass.getName} value '$v' to ${l.getClass.getName}")
  }
}

/** Hot-reloadable property (`DynamicProperty.java:31-70`): set() validates,
  * swaps, and notifies listeners — the reload hook that drains/recreates
  * state in the reference (`PartitionContexts.maybeHandlePropertyReload`)
  * maps to a Spark trigger-boundary re-broadcast.
  */
final class DynamicProperty[T](val definition: PropertyDefinition[T], initial: T)
    extends Serializable {
  private val ref = new AtomicReference[T](definition.validate(initial))
  // transient: a property captured in a Spark closure ships its CURRENT
  // value to the executor (trigger-boundary snapshot); listeners are a
  // driver-side concern and must not drag arbitrary captures into the
  // closure. Lazy so a deserialized copy gets a fresh empty list.
  @transient private lazy val listeners = new AtomicReference[List[(T, T) => Unit]](Nil)

  def value: T = ref.get()
  def set(v: T): Unit = {
    val validated = definition.validate(v)
    val old = ref.getAndSet(validated)
    // each listener individually guarded (the reference's swallow-listener
    // contract): one throwing listener must not skip later-registered ones
    // — the skipped notification would be unrecoverable, since a retried
    // set() sees old == validated and never re-fires. Logged, not silent:
    // the reference's AbstractProperty.notifyListener warns on a throwing
    // listener, and the stack trace is the only diagnostic a buggy listener
    // ever emits.
    if (old != validated)
      listeners.get().foreach(l => try l(old, validated) catch {
        case e: Exception =>
          System.err.println(
            s"[graft-config] listener for ${definition.name} threw on " +
              s"$old -> $validated: $e")
      })
  }

  /** Register a change listener; returns a deregistration handle (removal by
    * listener identity) so listener-holding consumers (e.g. a closed rate
    * limiter) don't leak for the property's lifetime.
    */
  def onChange(f: (T, T) => Unit): () => Unit = {
    // fresh wrapper per registration: removal is by identity of the ENTRY,
    // so two registrations sharing one listener function value can't
    // deregister each other
    val entry: (T, T) => Unit = (a, b) => f(a, b)
    listeners.updateAndGet(entry :: _)
    () => { listeners.updateAndGet(_.filterNot(_ eq entry)); () }
  }
}

/** The engine's property registry with first-supplier-wins resolution. */
final class Properties(suppliers: Seq[PropertySupplier]) {
  def resolve[T](d: PropertyDefinition[T]): T =
    suppliers.view.flatMap(_.get(d)).headOption.map(d.validate).getOrElse(d.default)

  def dynamic[T](d: PropertyDefinition[T]): DynamicProperty[T] =
    new DynamicProperty[T](d, resolve(d))
}

/** The reference's engine knobs (`ProcessorProperties.java:46-272`), mapped
  * to their Spark-native meaning where one exists.
  */
object EngineProperties {
  /** ignore-list for key blocking (F1). */
  val IgnoreKeys: PropertyDefinition[Seq[String]] =
    PropertyDefinition("decaton.ignore.keys", Seq.empty)
  /** per-partition concurrency (O3) → shuffle partition count here. */
  val PartitionConcurrency: PropertyDefinition[Int] =
    PropertyDefinition("decaton.partition.concurrency", 1, (v: Int) => v > 0)
  /** max pending records (O5) → maxOffsetsPerTrigger-style intake bound. */
  val MaxPendingRecords: PropertyDefinition[Int] =
    PropertyDefinition("decaton.max.pending.records", 10000, (v: Int) => v > 0)
  /** processing rate per partition (C2); -1 unlimited, 0 paused, positive
    * rates capped at the reference's MAX_RATE (`RateLimiter.java:25`).
    */
  val ProcessingRate: PropertyDefinition[Long] =
    PropertyDefinition("decaton.processing.rate.per.partition", -1L,
      (v: Long) => v >= -1L && v <= graft.operators.RateLimit.MaxRatePerPartition)
  /** commit interval (O6) → trigger interval. */
  val CommitIntervalMs: PropertyDefinition[Long] =
    PropertyDefinition("decaton.commit.interval.ms", 1000L, (v: Long) => v >= 0L)
  /** retry backoff (C3). */
  val RetryBackoffMs: PropertyDefinition[Long] =
    PropertyDefinition("decaton.retry.backoff.ms", 100L, (v: Long) => v >= 0L)
  /** legacy envelope fallback parse (F2). */
  val LegacyParseFallbackEnabled: PropertyDefinition[Boolean] =
    PropertyDefinition("decaton.legacy.parse.fallback.enabled", true)
  /** deferred-completion timeout (T4) → [[graft.streaming.CompletionPolicy
    * .fromProperty]]. Reference default -1 = reaping disabled
    * (`ProcessorProperties.java:196-198`): tasks wait unbounded and the
    * EXTEND/GIVE_UP callback never fires.
    */
  val DeferredCompleteTimeoutMs: PropertyDefinition[Long] =
    PropertyDefinition("decaton.deferred.complete.timeout.ms", -1L,
      (v: Long) => v >= -1L)
  /** produce retry tasks in the pre-9.0 value envelope (E1 migration aid,
    * `ProcessorProperties.java:238-240`) → `TaskWriter.toRetryShape`'s
    * envelope choice.
    */
  val RetryTaskInLegacyFormat: PropertyDefinition[Boolean] =
    PropertyDefinition("decaton.retry.task.in.legacy.format", false)
  /** per-poll record cap the reference forces onto every consumer
    * (`ConsumerSupplier.java:57-61`, default 100) → the default per-trigger
    * admission cap of `TaskSource.brokerStream` when no explicit
    * `maxOffsetsPerTrigger` is given.
    */
  val MaxPollRecords: PropertyDefinition[Int] =
    PropertyDefinition("decaton.max.poll.records", 100, (v: Int) => v > 0)
  /** per-key processing-rate quota (A4), effective only when quota routing
    * is enabled; -1 unlimited, bounded by the reference's MAX_RATE
    * (`ProcessorProperties.java:205-210`) → `PerKeyQuota.quotaFromProperties`.
    */
  val PerKeyQuotaProcessingRate: PropertyDefinition[Long] =
    PropertyDefinition("decaton.per.key.quota.processing.rate", -1L,
      (v: Long) => v >= -1L && v <= graft.operators.RateLimit.MaxRatePerPartition)
}
