package graft

import org.apache.spark.sql.SparkSession

/** Benchmark entry: times every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is forced through the
  * noop datasource so the whole plan materializes (a bare count() would let
  * Catalyst prune aggregations away); first query also pays session warm-up,
  * so a trivial warm-up plan runs first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/session warm-up outside the timed region: exercise codegen and the
    // parquet read paths (incl. the events nanos conversion) once
    spark.range(1000000L).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    Tables.lineitem(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.events(spark, sfDir).write.format("noop").mode("overwrite").save()
    Tables.documents(spark, sfDir).write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
