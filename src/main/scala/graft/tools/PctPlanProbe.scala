package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off: print pq75/q21's executed percentile plan and its Exchange list
  * (debugging the all-null-census branch's exchange count).
  */
object PctPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val e = spark.read.parquet(s"$dir/events.parquet")
    val df = graft.operators.Percentiles.exactGroupPercentiles(
      e, col("event_type"), col("value"), Seq(0.5, 0.9))
    val plan = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/pct_plan.txt"), plan)
    spark.stop()
  }
}
