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
  */
sealed trait ProcessorScope
object ProcessorScope {
  /** Caller supplies and owns the instance. */
  case object Provided extends ProcessorScope
  /** One instance per executor JVM (the subscription-singleton analog). */
  case object Singleton extends ProcessorScope
  /** One instance per partition-task invocation. */
  case object Partition extends ProcessorScope
}

/** Scope-aware factory usable inside mapPartitions closures. Serializable:
  * ships the factory, not the instance; instances materialize executor-side.
  */
final class ScopedSupplier[P <: AnyRef](scope: ProcessorScope, factory: () => P)
    extends Serializable {

  @transient private lazy val singleton: P = factory()

  /** Get the instance for the current partition invocation. */
  def get(partitionId: Int): P = scope match {
    case ProcessorScope.Provided | ProcessorScope.Singleton =>
      // per-JVM: lazy val materializes once per executor after deserialization
      singleton
    case ProcessorScope.Partition => factory()
  }
}

object ScopedSupplier {
  /** Executor-JVM-wide instance counter keyed by name — lets tests (and
    * metrics) observe how many instances each scope actually created,
    * mirroring the reference's lifecycle assertions in CoreFunctionalityTest.
    */
  val instanceCounts = new ConcurrentHashMap[String, AtomicInteger]()
  def countInstance(name: String): Int =
    instanceCounts.computeIfAbsent(name, _ => new AtomicInteger(0)).incrementAndGet()
}
