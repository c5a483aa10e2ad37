package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

import graft.api.{ProcessorScope, ScopedSupplier}
import graft.core.MetaCodec
import graft.sources.TaskWriter

/** Executor-JVM-static teardown observability: local[*] tests share the JVM,
  * so the spec reads what the task-side listeners did. Top-level (not inner)
  * classes — an inner pool would drag the non-serializable spec into the
  * closure.
  */
private object ScopeTeardownCounters {
  val created = new java.util.concurrent.atomic.AtomicInteger(0)
  val closed = new java.util.concurrent.atomic.AtomicInteger(0)
  val doubleClosed = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { created.set(0); closed.set(0); doubleClosed.set(0) }
}

private class CountingPool extends AutoCloseable with Serializable {
  ScopeTeardownCounters.created.incrementAndGet()
  private val closedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
  override def close(): Unit =
    if (closedOnce.compareAndSet(false, true)) ScopeTeardownCounters.closed.incrementAndGet()
    else ScopeTeardownCounters.doubleClosed.incrementAndGet()
}

private class ThrowingPool extends AutoCloseable with Serializable {
  override def close(): Unit = throw new IllegalStateException("close-boom")
}

class ScopeAndWriterSpec extends SparkTestBase {

  test("partition scope creates one instance per partition task; singleton one per JVM (T3)") {
    import spark.implicits._
    ScopedSupplier.instanceCounts.clear()
    val perPart = new ScopedSupplier(ProcessorScope.Partition,
      () => { ScopedSupplier.countInstance("part"); new Object })
    val single = new ScopedSupplier(ProcessorScope.Singleton,
      () => { ScopedSupplier.countInstance("single"); new Object })
    val df = spark.range(100).repartition(5)
    df.mapPartitions { it =>
      val a = perPart.get(); val b = single.get()
      Iterator.single(it.size)
    }.collect()
    assert(ScopedSupplier.instanceCounts.get("part").get() == 5)
    // true per-JVM singleton: exactly one instance regardless of how many
    // tasks deserialized copies of the supplier
    assert(ScopedSupplier.instanceCounts.get("single").get() == 1)
  }

  test("PROVIDED scope returns the caller's instance and never constructs (T3)") {
    ScopedSupplier.instanceCounts.clear()
    val mine = new java.util.concurrent.atomic.AtomicLong(42L) // caller-built state
    val sup = ScopedSupplier.provided(mine)
    assert(sup.get() eq mine, "driver-side get must return the caller's exact instance")
    import spark.implicits._
    val seen = spark.range(20).repartition(4).mapPartitions { it =>
      Iterator.single(sup.get().get())
    }.collect()
    assert(seen.forall(_ == 42L), "executors must see the caller's (deserialized) instance")
    // factory form must refuse the Provided scope
    intercept[IllegalArgumentException] {
      new ScopedSupplier(ProcessorScope.Provided, () => new Object)
    }
  }

  test("Partition-scoped AutoCloseable processors close exactly once at task end (T3 teardown)") {
    import spark.implicits._
    ScopeTeardownCounters.reset()
    val sup = new ScopedSupplier(ProcessorScope.Partition, () => new CountingPool)
    spark.range(60).repartition(6).mapPartitions { it =>
      val p = sup.get() // pool lives for the whole partition invocation
      Iterator.single(it.size)
    }.collect()
    assert(ScopeTeardownCounters.created.get() == 6)
    assert(ScopeTeardownCounters.closed.get() == 6,
      "every partition-scoped pool must close at its task's end")
    assert(ScopeTeardownCounters.doubleClosed.get() == 0)
  }

  test("per-RECORD get() is memoized per task: same instance, one close (ADVICE r13)") {
    import spark.implicits._
    ScopeTeardownCounters.reset()
    val sup = new ScopedSupplier(ProcessorScope.Partition, () => new CountingPool)
    val distinctRefs = spark.range(300).repartition(3).mapPartitions { it =>
      // a stale call site invoking get() per record must NOT build a pool
      // per record (O(records) listeners + live instances until task end)
      val ids = it.map(_ => System.identityHashCode(sup.get())).toSet
      Iterator.single(ids.size)
    }.collect()
    assert(distinctRefs.forall(_ == 1), "all get() calls in one task must return the SAME instance")
    assert(ScopeTeardownCounters.created.get() == 3, "one pool per task, not per record")
    assert(ScopeTeardownCounters.closed.get() == 3)
    assert(ScopeTeardownCounters.doubleClosed.get() == 0)
    assert(graft.api.ScopedSupplier.taskInstances.isEmpty,
      "completion listeners must drain the task-instance map")
  }

  test("Partition-scope teardown runs on task FAILURE too (partition-revoke analog)") {
    import spark.implicits._
    ScopeTeardownCounters.reset()
    val sup = new ScopedSupplier(ProcessorScope.Partition, () => new CountingPool)
    intercept[org.apache.spark.SparkException] {
      spark.range(20).repartition(4).mapPartitions { it =>
        val p = sup.get()
        if (org.apache.spark.TaskContext.getPartitionId() == 0)
          throw new RuntimeException("processor blew up")
        it.map(_.longValue())
      }.collect()
    }
    // concurrent sibling tasks may be killed as the job fails; their
    // completion listeners still run — poll until every created pool closed
    val deadline = System.currentTimeMillis() + 5000
    while (ScopeTeardownCounters.closed.get() != ScopeTeardownCounters.created.get() &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(ScopeTeardownCounters.created.get() > 0)
    assert(ScopeTeardownCounters.closed.get() == ScopeTeardownCounters.created.get(),
      "a failing task must still close its pool — that's the leak the hook exists for")
    assert(ScopeTeardownCounters.doubleClosed.get() == 0)
  }

  test("Singleton closes at executor stop (closeSingletons), exactly once, idempotent") {
    import spark.implicits._
    ScopeTeardownCounters.reset()
    val sup = new ScopedSupplier(ProcessorScope.Singleton, () => new CountingPool)
    spark.range(40).repartition(8).mapPartitions { it =>
      sup.get(); Iterator.single(it.size)
    }.collect()
    assert(ScopeTeardownCounters.created.get() == 1)
    assert(ScopeTeardownCounters.closed.get() == 0,
      "the subscription singleton must SURVIVE task end")
    ScopedSupplier.closeSingletons()
    assert(ScopeTeardownCounters.closed.get() == 1)
    ScopedSupplier.closeSingletons() // idempotent — no double close
    assert(ScopeTeardownCounters.closed.get() == 1 &&
      ScopeTeardownCounters.doubleClosed.get() == 0)
    // a fresh get() after teardown rebuilds (new subscription analog)
    assert(sup.get() ne null)
    assert(ScopeTeardownCounters.created.get() == 2)
    ScopedSupplier.closeSingletons()
  }

  test("Provided instances are caller-owned: the engine NEVER closes them") {
    import spark.implicits._
    ScopeTeardownCounters.reset()
    val mine = new CountingPool
    val sup = ScopedSupplier.provided(mine)
    spark.range(20).repartition(4).mapPartitions { it =>
      sup.get(); Iterator.single(it.size)
    }.collect()
    ScopedSupplier.closeSingletons()
    assert(ScopeTeardownCounters.closed.get() == 0,
      "Provided scope: close is the caller's job (ProcessorScope.java:24-45)")
  }

  test("a throwing close() is logged, never fails the task or skips siblings") {
    import spark.implicits._
    val sup = new ScopedSupplier(ProcessorScope.Partition, () => new ThrowingPool)
    val out = spark.range(10).repartition(2).mapPartitions { it =>
      sup.get(); Iterator.single(it.size)
    }.collect()
    assert(out.sum == 10, "teardown failure must not fail the data path")
  }

  test("TaskWriter produces the Kafka sink shape with a decodable dt_meta header (S3)") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).limit(10)
      .withColumn("meta", struct(
        unix_millis(col("ts")).as("timestamp_millis"),
        lit("graft").as("source_application_id"),
        lit("i-1").as("source_instance_id"),
        lit(0L).as("retry_count"),
        lit(0L).as("scheduled_time_millis")))
    val out = TaskWriter.toKafkaShape(e, col("user_id"), col("props"), col("meta"), "events")
    assert(out.columns.toSeq == Seq("key", "value", "headers", "topic"))
    val row = out.head()
    val headers = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers")
    assert(headers.map(_.getString(0)).toSeq == Seq("dt_meta"))
    val decoded = MetaCodec.decode(headers.head.getAs[Array[Byte]](1))
    assert(decoded.sourceApplicationId == "graft" && decoded.sourceInstanceId == "i-1")
    assert(row.getAs[String]("topic") == "events")
  }

  test("TaskWriter retry shape advances retry metadata and targets <topic>-retry (S4)") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).limit(5)
      .withColumn("meta", struct(
        unix_millis(col("ts")).as("timestamp_millis"),
        lit("graft").as("source_application_id"),
        lit("i-1").as("source_instance_id"),
        lit(1L).as("retry_count"),
        lit(0L).as("scheduled_time_millis")))
    val out = TaskWriter.toRetryShape(e, col("user_id"), col("props"), col("meta"),
      "events", lit(1000L), lit(250L))
    val row = out.head()
    assert(row.getAs[String]("topic") == "events-retry")
    val decoded = MetaCodec.decode(
      row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers").head.getAs[Array[Byte]](1))
    assert(decoded.retryCount == 2L)
    assert(decoded.scheduledTimeMillis == 1250L)
  }

  test("retry.task.in.legacy.format produces the pre-9.0 envelope with no dt_meta header") {
    import spark.implicits._
    val e = Tables.events(spark, sfDir).limit(5)
      .withColumn("meta", struct(
        unix_millis(col("ts")).as("timestamp_millis"),
        lit("graft").as("source_application_id"),
        lit("i-1").as("source_instance_id"),
        lit(1L).as("retry_count"),
        lit(0L).as("scheduled_time_millis")))
    val legacy = TaskWriter.toRetryShape(e, col("user_id"), col("props"), col("meta"),
      "events", lit(1000L), lit(250L),
      legacyFormat = true)
    val row = legacy.head()
    assert(row.getAs[String]("topic") == "events-retry")
    // the reference REMOVES the metadata header in legacy mode
    // (DecatonTaskRetryQueueingProcessor.java:91) so fallback parsing can
    // dispatch on header absence
    assert(row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("headers").isEmpty)
    // the advanced metadata and the original payload round-trip through the
    // legacy value envelope
    val unwrapped = legacy.select(
      graft.functions.legacy_envelope_decode(col("value")).as("t"))
      .select(col("t.meta.retry_count"), col("t.meta.scheduled_time_millis"),
        col("t.task").cast("string"))
      .as[(Long, Long, String)].head()
    assert(unwrapped._1 == 2L && unwrapped._2 == 1250L)
    val originals = e.select(col("props")).as[String].collect().toSet
    assert(originals.contains(unwrapped._3), "payload must survive the envelope")
  }
}
