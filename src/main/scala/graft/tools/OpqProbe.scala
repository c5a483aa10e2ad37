package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.{Knn, Pq, Eval}

/** Diagnostic for [[Pq.trainOpq]]: per-iteration quantization distortion
  * (must fall monotonically if the alternating optimization is wired
  * right) and end recall vs the permutation tier, across iteration knobs.
  * Usage: runMain graft.tools.OpqProbe [sfDir]
  */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

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
    def kmeans(xr: Array[Array[Double]], iters: Int): Array[Array[Array[Double]]] = {
      val cb = Array.tabulate(m, k)((s, c) => java.util.Arrays.copyOfRange(xr(c), s * w, (s + 1) * w))
      for (_ <- 1 to iters; s <- 0 until m) {
        val base = s * w
        val sums = Array.fill(k, w)(0.0); val counts = new Array[Int](k)
        xr.foreach { x =>
          var best = 0; var bestD = Double.MaxValue
          for (c <- 0 until k) {
            var acc = 0.0
            for (j <- 0 until w) { val t = x(base + j) - cb(s)(c)(j); acc += t * t }
            if (acc < bestD) { best = c; bestD = acc }
          }
          for (j <- 0 until w) sums(best)(j) += x(base + j)
          counts(best) += 1
        }
        for (c <- 0 until k if counts(c) > 0; j <- 0 until w) cb(s)(c)(j) = sums(c)(j) / counts(c)
      }
      cb
    }
    def recon(cb: Array[Array[Array[Double]]], x: Array[Double]) = {
      val y = new Array[Double](d)
      for (s <- 0 until m) {
        val base = s * w
        var best = 0; var bestD = Double.MaxValue
        for (c <- 0 until k) {
          var acc = 0.0
          for (j <- 0 until w) { val t = x(base + j) - cb(s)(c)(j); acc += t * t }
          if (acc < bestD) { best = c; bestD = acc }
        }
        System.arraycopy(cb(s)(best), 0, y, base, w)
      }
      y
    }
    def distortion(r: Array[Array[Double]], cb: Array[Array[Array[Double]]]): Double =
      X.map { x =>
        val xr = matvec(r, x); val y = recon(cb, xr)
        (0 until d).map(i => { val t = xr(i) - y(i); t * t }).sum
      }.sum / X.length

    // replicate trainOpq's loop with distortion printing
    val perm = {
      val n = X.length.toDouble
      val variances = (0 until d).map { j =>
        var sx = 0.0; var sxx = 0.0
        X.foreach { x => sx += x(j); sxx += x(j) * x(j) }
        (j, sxx / n - (sx / n) * (sx / n))
      }
      val load = Array.fill(m)(0.0); val slots = Array.fill(m)(0)
      val assigned = Array.fill(m)(List.empty[Int])
      variances.sortBy { case (dim, v) => (-v, dim) }.foreach { case (dim, v) =>
        val s = (0 until m).filter(slots(_) < w).minBy(i => (load(i), i))
        load(s) += v; slots(s) += 1; assigned(s) = dim :: assigned(s)
      }
      assigned.toSeq.flatMap(_.sorted)
    }
    var r = Pq.permutationMatrix(perm).map(_.toArray).toArray
    for (it <- 1 to 10) {
      val xr = X.map(matvec(r, _))
      val cb = kmeans(xr, 4)
      println(f"iter $it%2d distortion after kmeans = ${distortion(r, cb)}%.4f")
      val y = xr.map(recon(cb, _))
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
