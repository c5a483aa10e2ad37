package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DumpCcPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(1000).select((col("id") % 500).as("u"), (col("id") % 499).as("v")).repartition(col("v"))
    val labels = spark.range(500).select(col("id"), col("id").as("lbl"))
    val propagated = graft.dedup.Dedup.ccPropagate(edges, labels)
    println("==== propagate (planned once per round, pinned via localCheckpoint) ====")
    println(propagated.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    println("==== jump (over the pinned propagate result, as the loop runs it) ====")
    val jump = graft.dedup.Dedup.ccJump(propagated.localCheckpoint())
    println(jump.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
