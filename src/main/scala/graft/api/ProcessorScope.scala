package graft.api

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** T3 — processor lifecycle scopes (`ProcessorScope.java:24-45`,
  * instance management `Processors.java:100-130`).
  *
  * The reference creates one processor instance per scope unit: PROVIDED
  * (caller-managed), SINGLETON (per subscription), PARTITION, THREAD. In
  * Spark the natural units are the executor JVM (singleton via lazy static),
  * the task/partition (fresh instance in each `mapPartitions` invocation),
  * and the row-closure. [[ScopedSupplier]] reproduces the contract so
  * stateful user processors (connection pools, caches) land at the right
  * granularity.
  *
  * TEARDOWN mirrors the reference's `Processors.destroyBySupplier` →
  * `DecatonProcessor.close()` on partition revoke / subscription shutdown
  * (`Processors.java:100-130`, parallel teardown
  * `PartitionContexts.destroyProcessors:315-326`): a Partition-scoped
  * instance implementing `AutoCloseable` closes when its task ends
  * (success or failure — the partition-revoke analog), a Singleton closes
  * at executor stop (JVM shutdown hook, or [[ScopedSupplier
  * .closeSingletons]] explicitly), and a Provided instance is caller-owned
  * and never closed by the engine (`ProcessorScope.java:24-45`).
  */
sealed trait ProcessorScope
object ProcessorScope {
  /** Caller supplies and owns an EXISTING instance ([[ScopedSupplier.provided]]):
    * the engine never constructs or closes it. The instance must be
    * Serializable — each executor JVM works with its own deserialized copy,
    * the closest distributed analog of the reference's caller-owned object.
    */
  case object Provided extends ProcessorScope
  /** One instance per executor JVM (the subscription-singleton analog). */
  case object Singleton extends ProcessorScope
  /** One instance per partition-task invocation. */
  case object Partition extends ProcessorScope
}

/** Scope-aware factory usable inside mapPartitions closures. Serializable:
  * ships the factory (or, for Provided, the caller's instance itself);
  * factory-built instances materialize executor-side.
  *
  * Calling [[get]] per record inside a task is safe (Partition scope
  * memoizes per task attempt), but the idiomatic call site is once at the
  * top of the mapPartitions closure.
  */
final class ScopedSupplier[P <: AnyRef] private (
    scope: ProcessorScope,
    factory: () => P,
    providedInstance: Option[P])
    extends Serializable {

  /** Factory form — Singleton or Partition scope. For Provided use
    * [[ScopedSupplier.provided]], which takes the instance itself.
    */
  def this(scope: ProcessorScope, factory: () => P) = {
    this(scope, factory, None)
    require(scope != ProcessorScope.Provided,
      "Provided scope takes an existing instance: use ScopedSupplier.provided(instance)")
  }

  // identity survives closure serialization so every deserialized copy of
  // this supplier resolves to the SAME executor-JVM singleton (a @transient
  // lazy val would re-initialize per task deserialization — per-task, not
  // per-JVM)
  private val supplierId: String = java.util.UUID.randomUUID().toString

  /** Get the instance for the current partition-task invocation.
    *
    * Partition scope is memoized per (supplier, task attempt): repeated
    * calls within one task — including accidental per-RECORD calls — return
    * the SAME instance with ONE completion listener, matching the
    * reference's one-instance-per-partition contract (`Processors
    * .java:100-130`) instead of accumulating O(records) listeners and live
    * instances whose closes all defer to task end.
    *
    * A Partition-scoped `AutoCloseable` instance is closed EXACTLY ONCE at
    * the end of the running task — including task failure — via the task
    * completion listener (Spark's partition-revoke boundary); a pooled
    * processor cannot leak its pool at task end. Outside a running task
    * (driver-side use) every call constructs fresh and the caller owns
    * closing the returned instance.
    * Singleton instances close at JVM shutdown / [[ScopedSupplier
    * .closeSingletons]]; Provided instances are never closed by the engine.
    */
  def get(): P = scope match {
    case ProcessorScope.Provided => providedInstance.get
    case ProcessorScope.Singleton =>
      ScopedSupplier.jvmSingletons
        .computeIfAbsent(supplierId, _ => factory()).asInstanceOf[P]
    case ProcessorScope.Partition =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc == null) factory()
      else {
        // one task attempt = one thread, so plain get/put on the shared map
        // cannot race on this key (speculative copies get distinct attempt
        // ids); the listener removes the entry, so the map never outgrows
        // the set of RUNNING tasks
        val key = supplierId + "#" + tc.taskAttemptId()
        val existing = ScopedSupplier.taskInstances.get(key)
        if (existing != null) existing.asInstanceOf[P]
        else {
          val p = factory()
          ScopedSupplier.taskInstances.put(key, p)
          tc.addTaskCompletionListener[Unit] { _ =>
            val v = ScopedSupplier.taskInstances.remove(key)
            if (v != null) ScopedSupplier.closeQuietly(v)
          }
          p
        }
      }
  }
}

object ScopedSupplier {
  /** PROVIDED scope: the caller supplies and owns `instance` (pre-built
    * state, caller-managed close — `ProcessorScope.java:24-45`). It ships
    * with the closure, so it must be Serializable.
    */
  def provided[P <: AnyRef with Serializable](instance: P): ScopedSupplier[P] =
    new ScopedSupplier[P](ProcessorScope.Provided, () => instance, Some(instance))

  /** Executor-JVM-wide singleton instances, keyed by supplier identity. */
  private val jvmSingletons = new ConcurrentHashMap[String, AnyRef]()

  /** Live Partition-scoped instances keyed by (supplierId, taskAttemptId);
    * entries are removed by each task's completion listener.
    */
  private[graft] val taskInstances = new ConcurrentHashMap[String, AnyRef]()

  // executor stop = subscription shutdown: close surviving singletons at
  // JVM exit (the reference closes scoped processors when the subscription
  // shuts down — Processors.java:100-130)
  Runtime.getRuntime.addShutdownHook(
    new Thread(() => closeSingletons(), "graft-scope-teardown"))

  /** Close and forget every JVM-singleton instance — the executor-stop /
    * subscription-shutdown teardown, also callable explicitly (tests,
    * embedded runtimes). Exactly-once per instance even under concurrent
    * calls: the map entry is atomically removed before its close() runs.
    */
  def closeSingletons(): Unit =
    jvmSingletons.keySet().forEach { k =>
      val v = jvmSingletons.remove(k)
      if (v != null) closeQuietly(v)
    }

  /** `close()` an `AutoCloseable` instance, logging (never propagating) a
    * close-time failure — teardown of one processor must not fail the task
    * or skip the teardown of others, the reference's destroyProcessors
    * error posture. Non-closeable instances are a no-op.
    */
  private[api] def closeQuietly(p: AnyRef): Unit = p match {
    case c: AutoCloseable =>
      try c.close()
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[graft-scope] processor close() threw: $e")
      }
    case _ => ()
  }

  /** Executor-JVM-wide instance counter keyed by name — lets tests (and
    * metrics) observe how many instances each scope actually created,
    * mirroring the reference's lifecycle assertions in CoreFunctionalityTest.
    */
  val instanceCounts = new ConcurrentHashMap[String, AtomicInteger]()
  def countInstance(name: String): Int =
    instanceCounts.computeIfAbsent(name, _ => new AtomicInteger(0)).incrementAndGet()
}
