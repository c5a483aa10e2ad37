package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Plan auditor: prints the formatted physical plan of each query and checks
  * the scale-critical plan properties (predicate pushdown into the parquet
  * scan, column-pruned read schemas, broadcast joins on dimension tables,
  * whole-stage codegen coverage). Usage:
  *   runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {

  /** Scale-critical plan facts for one query (AQE must be off in the session
    * for codegen ids to appear in the pre-execution plan).
    */
  final case class PlanFacts(
      pushedFilters: Boolean, broadcastJoins: Int, codegenSpans: Int, wideReads: Int)

  def audit(df: org.apache.spark.sql.DataFrame): PlanFacts = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
    val broadcasts = "BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(plan).size
    // AQE's pre-execution formatted plan hides codegen ids; the simple-mode
    // string marks each whole-stage span with "*(n)".
    val simplePlan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val codegenSpans = "\\*\\((\\d+)\\)".r.findAllMatchIn(simplePlan)
      .map(_.group(1).toInt).toSet.size
    val fullScans = plan.linesIterator.count(l => l.contains("ReadSchema") && l.length > 400)
    PlanFacts(pushed, broadcasts, codegenSpans, fullScans)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static audit: AQE off so the pre-execution plan carries codegen ids
      // (prod sessions keep AQE on; it only re-plans at runtime)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val f = audit(df)
      println(s"==== $name pushedFilters=${f.pushedFilters} broadcastJoins=${f.broadcastJoins} " +
        s"codegenSpans=${f.codegenSpans} wideReads=${f.wideReads}")
      if (sys.env.get("GRAFT_EXPLAIN_FULL").contains("1"))
        println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
