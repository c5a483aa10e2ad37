package graft.tools

import org.apache.spark.sql.SparkSession

/** Execute named registered queries with AQE ON and print the final
  * ADAPTIVE executed plan's join/exchange skeleton — the runtime complement
  * to [[graft.Explain]] (which audits the static, AQE-off shapes PLANS.md
  * records). Use to answer "does AQE turn this shuffle join into a
  * broadcast at this sf?" with the plan that actually ran.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PlanPeek <query> [query...]
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    require(args.nonEmpty, "pass query names")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // drive THIS DataFrame's own QueryExecution: a df.write would plan a
      // separate write-command QueryExecution and leave df.queryExecution's
      // AdaptiveSparkPlanExec unexecuted (isFinalPlan=false), printing the
      // pre-AQE initial plan instead of the one that ran
      df.queryExecution.toRdd.foreach(_ => ())
      // AdaptiveSparkPlanExec prints the final plan followed by an
      // "== Initial Plan ==" section — keep only what ran
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      require(!plan.contains("isFinalPlan=false"),
        s"$name: adaptive plan did not finalize — the printed skeleton would be the initial plan")
      println(s"== $name @ $sfDir ==")
      plan.linesIterator
        .map(_.trim.dropWhile(c => c == '+' || c == '-' || c == ':' || c == ' ' || c == '*'))
        .filter(l => l.startsWith("BroadcastHashJoin") || l.startsWith("SortMergeJoin") ||
          l.startsWith("ShuffledHashJoin") || l.startsWith("BroadcastNestedLoopJoin") ||
          l.startsWith("Exchange") || l.startsWith("AQEShuffleRead") ||
          l.startsWith("BroadcastExchange"))
        .foreach(l => println("  " + l.take(140)))
    }
    spark.stop()
  }
}
