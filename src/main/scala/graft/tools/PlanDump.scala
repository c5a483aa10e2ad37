package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of named registered queries to files — the
  * optimization-round evidence artifacts (`plans/r20/<query>_<tag>.txt`).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.PlanDump <outDir> <tag> <query> [query...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val names = args.drop(2).toSeq
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // AQE off so the formatted plan carries codegen ids and final shapes
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${name}_$tag.txt"), plan)
      System.err.println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
