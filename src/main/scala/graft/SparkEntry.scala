package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator the engine implements is exposed here twice: as a Spark
  * program under [[queries]] and (when SQL-expressible) as the equivalent
  * DuckDB SQL under [[oracleSql]] — the driver diff-tests the two at sf0.01.
  */
object SparkEntry {

  /** All verifiable queries, one per implemented operator (SURVEY.md §2). */
  private def registry: Seq[Q] =
    RelationalQueries.all ++ ExtendedQueries.all ++ DecatonQueries.all ++
      PipelineQueries.all ++ CrawlQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
