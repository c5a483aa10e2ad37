package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.Pq

/** Diagnostic for [[Pq.trainOpq]]: per-iteration quantization distortion
  * (must fall monotonically if the alternating optimization is wired
  * right). Runs trainOpq's OWN driver loop via the SHARED helpers
  * (greedyBalance / driverKmeans / driverReconstruct / Svd) — no replicated
  * algorithm to drift out of sync with the trainer.
  * Usage: runMain graft.tools.OpqProbe [sfDir]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val scaled = emb.withColumn("vs",
      zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
        (x, i) => x.cast("double") * when(i < 8, lit(8.0)).otherwise(lit(0.25))))
    val aniso = scaled.withColumn("va",
      transform(sequence(lit(0), lit(63)), i =>
        element_at(col("vs"), i + 1) +
          element_at(col("vs"), pmod(i + lit(4), lit(64)) + 1)))

    val X = aniso.select(col("vec_id"), col("va")).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toArray)
    val d = 64; val m = 16; val w = 4; val k = 16

    def matvec(r: Array[Array[Double]], x: Array[Double]) =
      Array.tabulate(d)(i => (0 until d).map(j => r(i)(j) * x(j)).sum)
    def distortion(r: Array[Array[Double]], cb: Array[Array[Array[Double]]]): Double =
      X.map { x =>
        val xr = matvec(r, x)
        val y = Pq.driverReconstruct(cb, xr, m, w)
        (0 until d).map(i => { val t = xr(i) - y(i); t * t }).sum
      }.sum / X.length

    // trainOpq's loop, via the shared helpers, with distortion printing
    var r = Pq.permutationMatrix(
      Pq.greedyBalance(Pq.sampleVariances(X, d), m, w)).map(_.toArray).toArray
    for (it <- 1 to 10) {
      val xr = X.map(matvec(r, _))
      val cb = Pq.driverKmeans(xr, m, k, w, 4)
      println(f"iter $it%2d distortion after kmeans = ${distortion(r, cb)}%.4f")
      val y = xr.map(Pq.driverReconstruct(cb, _, m, w))
      val b = Array.fill(d, d)(0.0)
      for (i <- X.indices; a <- 0 until d; bb <- 0 until d) b(a)(bb) += X(i)(a) * y(i)(bb)
      graft.similarity.Svd.decompose(b) match {
        case Some((u, v)) =>
          val nr = Array.tabulate(d, d)((a, c) => (0 until d).map(j => v(a)(j) * u(c)(j)).sum)
          r = nr
          println(f"          distortion after R update (old cb) = ${distortion(r, cb)}%.4f")
        case None => println("          SVD degenerate")
      }
    }
    spark.stop()
  }
}
