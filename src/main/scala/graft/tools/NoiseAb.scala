package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused A/B probe for the bench-noise question: time a handful of named
  * queries under exactly [[graft.Bench]]'s session config and warm-up
  * discipline, print one JSON line. Run alternately from two checkouts
  * (A = suspect-regression commit, B = baseline commit) so box drift hits
  * both sides; the committed deltas land in README's bench-methodology
  * notes. Not part of the driver contract — a diagnosis tool.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.NoiseAb <query> [query...]
  */
object NoiseAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("pq03_lsh_pairs", "pq23_dedup_clusters", "pq24_neardup_survivors")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    names.foreach(n => require(graft.SparkEntry.queries.contains(n), s"unknown query $n"))
    def runOnce(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Bench's warm-up discipline: codegen at a small sf, then one untimed
    // pass at the target sf
    val warmDir = {
      val parent = new java.io.File(sfDir).getParentFile
      Seq("sf0.01", "sf0.001").map(new java.io.File(parent, _))
        .find(w => w.isDirectory && w.getPath != sfDir).map(_.getPath).getOrElse(sfDir)
    }
    names.foreach(runOnce(_, warmDir))
    names.foreach(runOnce(_, sfDir))
    // 5 interleaved timed reps
    val reps = (1 to 5).map(_ => names.map(n => n -> runOnce(n, sfDir))).flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap
    def median(xs: Vector[Double]) = xs.sorted.apply((xs.size - 1) / 2)
    val js = names.map { n =>
      val r = reps(n)
      f""""$n":{"median":${median(r)}%.3f,"reps":${r.map(x => f"$x%.3f").mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"probe":"noise-ab","sf":"$sfDir","queries":$js}""")
    spark.stop()
  }
}
