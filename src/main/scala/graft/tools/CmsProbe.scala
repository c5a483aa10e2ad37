package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables

/** Rep variance for the production-size CMS probe (65536x12 salted merge) —
  * distinguishes machine stalls from real regressions in cms_full_sketch_sec.
  * Usage: runMain graft.tools.CmsProbe [sfDir] [reps]
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]").appName("cms-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.events(spark, dir).write.format("noop").mode("overwrite").save()
    def run(label: String)(mk: => org.apache.spark.sql.DataFrame): Seq[Double] = {
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"CMSREP $label $i: $s%.2f s")
        s
      }
      println(f"CMSREP $label median: ${times.sorted.apply(reps / 2)}%.2f s")
      times
    }
    // -Dcms.form=salted|repart|both (default both) so a fresh JVM can time
    // one form without the other's heap history
    val form = sys.props.getOrElse("cms.form", "both")
    if (form == "salted" || form == "both") run("salted") {
      graft.operators.PerKeyQuota.windowedSketchSalted(
        Tables.events(spark, dir), col("user_id"), col("ts"), "1 day",
        salts = 4, width = 65536, depth = 12)
    }
    if (form == "repart" || form == "both") run("repart") {
      graft.operators.PerKeyQuota.windowedSketchRepartitioned(
        Tables.events(spark, dir), col("user_id"), col("ts"), "1 day",
        salts = 4, width = 65536, depth = 12)
    }
    spark.stop()
  }
}
