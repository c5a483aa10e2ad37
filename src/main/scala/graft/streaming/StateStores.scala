package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-store selection. The default HDFS-backed provider keeps
  * every key's state on the JVM heap per partition — fine for tests, fatal
  * at 100 TB key cardinalities (per-key compaction/dedup state across
  * billions of keys). RocksDB keeps state off-heap with disk spill and ships
  * per-batch CHANGELOGS to the checkpoint instead of full snapshots, which
  * is the production posture for the stateful operators here
  * (`StatefulCompaction.compactTyped`, `StreamOps.dedupeStream`,
  * watermarked windowed aggs).
  *
  * Built on Spark's bundled provider (rocksdbjni ships with the Spark
  * distribution); StreamingSpec proves a stateful query runs and checkpoints
  * on it end-to-end.
  */
object StateStores {
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Point the session's streaming state at RocksDB with changelog
    * checkpointing. Returns the previous provider so callers (tests) can
    * restore it; affects queries STARTED after the call (provider is read at
    * query start from the session conf).
    */
  def useRocksDb(spark: SparkSession): String = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .getOrElse("")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
    // per-batch changelog upload instead of full-snapshot upload — the knob
    // that makes large state checkpointable at streaming cadence
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    prev
  }

  /** Restore a provider returned by [[useRocksDb]] ("" = Spark default). */
  def restoreProvider(spark: SparkSession, prev: String): Unit =
    if (prev.isEmpty)
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    else spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
}
