package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** F1 — key blocking (`BlacklistedKeysFilter.java:32-58`, `docs/key-blocking.adoc`).
  * Dropping is a plain filter, so dropped rows' offsets advance for free
  * (micro-batch commit covers every input row, matching "still committed").
  */
object KeyBlocking {
  /** Small, driver-known ignore list: folds into the scan as an isin predicate
    * (Catalyst pushes it to parquet/Kafka-side row filtering).
    */
  def blockKeys(df: DataFrame, keyCol: Column, ignore: Seq[Any]): DataFrame = {
    // a null LIST ENTRY would make `isin` null for every non-listed key —
    // !null is null and filter drops it: one null entry wipes the corpus
    require(!ignore.contains(null), "blockKeys: ignore list must not contain null")
    // null-KEYED rows are not blocklisted and must survive (isin is null for
    // them, and a null predicate silently drops) — blockKeysDf's anti join
    // keeps them, so this form must too
    if (ignore.isEmpty) df
    else df.filter(keyCol.isNull || !keyCol.isin(ignore: _*))
  }

  /** Large / dynamically-supplied ignore list: broadcast anti-join — at 100 TB
    * a million-key blocklist must not become an isin literal in the plan.
    */
  def blockKeysDf(df: DataFrame, keyCol: Column, ignoreDf: DataFrame): DataFrame = {
    val ignored = broadcast(ignoreDf.toDF("__blocked_key").distinct())
    df.join(ignored, keyCol === col("__blocked_key"), "left_anti")
  }
}

/** A1 — task compaction: per key keep one survivor per linger window, losers
  * complete immediately (`processors/CompactionProcessor.java:48-234`,
  * `docs/task-compaction.adoc`). Batch form: the linger window is an
  * event-time bucket and the user's compactor is an ordering; the survivor is
  * the max under that ordering. Implemented with max_by over a struct — a
  * single partial-aggregatable shuffle (no window-function sort), which at
  * 100 TB beats row_number by a full sort per partition.
  */
object Compaction {
  /** Stable column name for each (possibly expression-valued) key column:
    * plain references keep their name, aliases resolve to the alias, raw
    * expressions get a synthetic `<prefix>_i` name. Used to pre-project keys
    * before groupBy so expression keys (window(), arithmetic) group and
    * re-select correctly — `col(c.toString)` on an expression would be an
    * unresolvable attribute.
    */
  private[graft] def stableNames(cols: Seq[Column], prefix: String): Seq[String] =
    cols.zipWithIndex.map { case (c, i) =>
      val s = c.toString
      if (s.matches("[A-Za-z_][A-Za-z0-9_]*")) s // plain column reference
      else org.apache.spark.sql.graftbridge.GraftBridge.aliasName(c)
        .getOrElse(s"${prefix}_$i") // raw expression key: synthetic stable name
    }

  /** Guard for the stable-name pre-projection: an EXPRESSION key whose
    * stable name (alias or synthetic) collides with an existing input
    * column would make `withColumn` silently OVERWRITE that column before
    * the payload resolves against it — corrupted survivor payloads, no
    * error. Plain references self-collide harmlessly (`withColumn(n,
    * col(n))` is the identity). Duplicate stable names across keys would
    * likewise collapse two grouping keys into one.
    */
  private[graft] def requireFreshNames(
      df: DataFrame, cols: Seq[Column], names: Seq[String]): Unit = {
    require(names.distinct.size == names.size,
      s"key stable names collide with each other: $names")
    cols.zip(names).foreach { case (c, n) =>
      require(c.toString == n || !df.columns.contains(n),
        s"derived key name '$n' collides with an existing input column — " +
          "alias the key differently or rename the column")
    }
  }

  /** Keep, per (keys..., window of `lingerCol`), the row maximizing
    * `rankCols` lexicographically (ties impossible if the last rank col is
    * unique). Returns the key columns (under their stable names) followed
    * by the surviving rows' `payload` columns — callers re-selecting a key
    * should therefore NOT repeat it in `payload` (the duplicate name would
    * be ambiguous downstream).
    */
  def compactBatch(
      df: DataFrame,
      keyCols: Seq[Column],
      rankCols: Seq[Column],
      payload: Seq[Column]): DataFrame = {
    val names = stableNames(keyCols, "__gk")
    requireFreshNames(df, keyCols, names)
    val projected = keyCols.zip(names).foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
    val winner = max_by(struct(payload: _*), struct(rankCols: _*)).as("__winner")
    projected.groupBy(names.map(col): _*)
      .agg(winner)
      .select((names.map(col) :+ col("__winner.*")): _*)
  }
}

/** A2 — task batching: size-OR-time buffered flush
  * (`processors/BatchingProcessor.java:48-222`, size flush :149-163, time
  * flush :126-147; `docs/task-batching.adoc`). Batch form: the time dimension
  * is the trigger/window; the size dimension is a per-key running index
  * chunked by capacity. Streaming form lives in graft.streaming.
  */
object Batching {
  /** Assign each row a (key, batch_id) such that batches respect arrival
    * order and contain at most `capacity` rows.
    */
  def assignBatches(
      df: DataFrame,
      keyCol: Column,
      orderCols: Seq[Column],
      capacity: Int): DataFrame = {
    // capacity=0 divides to Infinity and casts to Long.MaxValue (ANSI off)
    // or fails a task with CAST_OVERFLOW (ANSI on) — fail at the call site
    require(capacity > 0, s"capacity=$capacity must be positive")
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    df.withColumn("batch_id", ((row_number().over(w) - 1) / capacity).cast("long"))
  }
}

/** C1 — delayed/scheduled execution: a task runs "at least after, not exactly
  * at" its `scheduled_time_millis` (`decaton.proto:18-21`,
  * `ExecutionScheduler.java:29-101`). In micro-batch terms: due rows process
  * this trigger; the rest carry to a later trigger (or back to the retry
  * topic). Pure predicates so Catalyst pushes them into the scan.
  */
object Scheduled {
  def isDue(scheduledMillisCol: Column, asOfMillis: Column): Column =
    scheduledMillisCol <= asOfMillis

  def due(df: DataFrame, scheduledMillisCol: Column, asOfMillis: Long): DataFrame =
    df.filter(isDue(scheduledMillisCol, lit(asOfMillis)))

  /** The complement of [[due]] INCLUDING null-scheduled rows: the two calls
    * partition the input ("due rows process this trigger; the rest carry"),
    * and a task whose schedule is unknown must carry forward, not vanish
    * from both halves (`!null` is null and a null predicate drops the row).
    */
  def notYetDue(df: DataFrame, scheduledMillisCol: Column, asOfMillis: Long): DataFrame =
    df.filter(!coalesce(isDue(scheduledMillisCol, lit(asOfMillis)), lit(false)))
}

/** E1/S4/C3 — retry queueing column transforms: the sink side re-produces a
  * failed task with `retry_count+1` and `scheduled_time = now + backoff`
  * (`DecatonTaskRetryQueueingProcessor.java:60-112`). Backoff may scale with
  * retry count (the reference's RetryConfig backoff function).
  */
object Retry {
  /** Metadata mutation for a task entering the retry topic. */
  def advanceRetry(metaCol: Column, nowMillis: Column, backoffMillis: Column): Column =
    metaCol
      .withField("retry_count", metaCol.getField("retry_count") + 1)
      .withField("scheduled_time_millis", nowMillis + backoffMillis)

  /** Reference topic naming: `<topic>-retry` (`RetryConfig.java:75-81`). */
  def retryTopic(originTopic: String): String = s"$originTopic-retry"

  /** Shaping topic naming: `<topic>-shaping` (`PerKeyQuotaConfig.java:124-136`). */
  def shapingTopic(originTopic: String): String = s"$originTopic-shaping"
}

/** O1 — out-of-order commit control, batch-observable form. The reference
  * keeps a per-partition deque of offset states and commits only the largest
  * prefix-complete offset (`OutOfOrderCommitControl.java:30-154`, watermark
  * advance :90-126). In Spark the micro-batch checkpoint IS that watermark;
  * this operator computes the same quantity explicitly for pipelines that
  * track fine-grained completion (e.g. async side effects inside
  * foreachBatch): the largest offset N per partition such that every offset
  * <= N has completed.
  */
object CommitControl {
  def highWatermark(df: DataFrame, partCol: Column, offsetCol: Column, completedCol: Column): DataFrame =
    df.groupBy(partCol.as("partition"))
      .agg(coalesce(
        // a NULL completion flag is UNKNOWN and must hold the watermark like
        // an incomplete offset — `!completedCol` alone is null for it, min()
        // would skip it, and the watermark would advance past an offset
        // whose completion was never observed (the loss OutOfOrderCommit
        // exists to prevent); n_complete already counts null as incomplete
        min(when(!coalesce(completedCol, lit(false)), offsetCol)) - 1,
        max(offsetCol)).as("high_watermark"),
        count(lit(1)).as("n_offsets"),
        count(when(completedCol, lit(1))).as("n_complete"))
}

/** C2 — rate limiting, static half. Two complementary controls:
  *
  *  - [[maxOffsetsPerTrigger]] sizes the source intake (rate × trigger
  *    seconds, per query; per-topic overrides = per-query settings, C4) —
  *    this bounds a batch but does not pace it;
  *  - [[graft.operators.DynamicRateLimiter]] + [[graft.operators.RateGate]]
  *    ENFORCE the rate on a running query: a token bucket (burst = 1 s)
  *    admits each micro-batch row-by-count, pauses completely at rate 0, and
  *    hot-reloads from a [[graft.config.DynamicProperty]] at the next
  *    trigger boundary.
  */
object RateLimit {
  val MaxRatePerPartition = 1000000L // RateLimiter.java:25

  /** maxOffsetsPerTrigger for a target per-partition rate. None = unlimited.
    * The per-partition rate is clamped to [[MaxRatePerPartition]] (the
    * reference's bound) BEFORE the multiply, and the product saturates at
    * Long.MaxValue instead of wrapping — the old `max(0, a*b*c)` masked an
    * overflow as Some(0), a FULL PAUSE where the caller asked for a huge
    * rate.
    */
  def maxOffsetsPerTrigger(ratePerPartition: Long, partitions: Int, triggerSeconds: Long): Option[Long] =
    if (ratePerPartition < 0) None
    else {
      require(partitions > 0 && triggerSeconds > 0,
        s"partitions=$partitions, triggerSeconds=$triggerSeconds must be positive")
      val rate = math.min(ratePerPartition, MaxRatePerPartition)
      val product = BigInt(rate) * partitions * triggerSeconds
      Some(product.min(BigInt(Long.MaxValue)).toLong)
    }
}
