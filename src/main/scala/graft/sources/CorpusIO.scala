package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the de-facto wire format of training-data
  * pipelines (one JSON document per line, gzip-friendly, streamable).
  *
  * Reading ALWAYS takes an explicit schema: schema inference costs a full
  * extra pass over the data (fatal at 100 TB) and silently widens types on
  * dirty corpora; with a declared schema the JSON parser projects only the
  * requested fields and malformed lines land in the standard
  * `_corrupt_record` column (PERMISSIVE mode) instead of failing the job —
  * the same drop-not-fail stance as the task-extraction path (F2).
  *
  * Writing compresses with gzip per part-file by default; `partitionByCols`
  * lays the corpus out for partition pruning (e.g. by lang/source), which
  * downstream readers exploit without touching non-matching directories.
  */
object CorpusIO {

  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType,
      keepCorrupt: Boolean = false): DataFrame = {
    val withCorrupt = if (keepCorrupt) schema.add("_corrupt_record", "string") else schema
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  def writeJsonl(
      df: DataFrame,
      path: String,
      partitionByCols: Seq[String] = Nil,
      compression: String = "gzip"): Unit = {
    val w = df.write.mode("overwrite").option("compression", compression)
    (if (partitionByCols.nonEmpty) w.partitionBy(partitionByCols: _*) else w).json(path)
  }
}
