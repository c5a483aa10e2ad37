package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location — the shuffle eliminator for repeated big-big
  * joins at 100 TB. Two tables bucketed into the same bucket count on their
  * join keys hash-split identically at WRITE time, so every join between
  * them plans with zero Exchange on either side (and zero Sort when also
  * sort-bucketed): the shuffle is paid once at ingest instead of per query.
  * This is the standard Spark answer for fact-fact joins too big to
  * broadcast and too hot to re-shuffle per query (lineitem⋈orders every
  * hour); BucketingSpec asserts the exchange-free plan and result equality.
  *
  * Plain `spark.read.parquet` cannot carry bucket metadata — bucketing
  * lives in the catalog — so these helpers write/read EXTERNAL bucketed
  * tables (explicit `path` option): data lands at the given path, the
  * catalog entry carries the bucket spec, and dropping the table keeps the
  * files.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table at `path`. `buckets`
    * should divide evenly into the cluster's parallelism at production scale
    * (e.g. 4096 for a 1000-executor cluster); sort columns additionally
    * pre-sort within buckets so joins skip their Sort too.
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      path: String,
      buckets: Int,
      keys: Seq[String],
      sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** The bucketed table as a DataFrame (bucket metadata attached — reading
    * the path directly would silently lose it and re-shuffle).
    */
  def readBucketed(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}
