package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** One-off timing probe for the connected-components round loop: breaks
  * pq23 into its phases (scan+minhash+pairs vs the label-propagation
  * rounds) so loop overhead is measurable in isolation. Not registered;
  * run with `runMain graft.tools.CcProbe <sfDir>`.
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("cc-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to 2) {
      println(s"rep $rep")
      val d = Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)
      val sigs = Dedup.minHashSignaturesWide(d, col("doc_id"), col("text"), k = 16, shingleSize = 5)
      val pairs = Dedup.lshCandidatePairs(Dedup.lshBandSignaturesWide(sigs, k = 16, bands = 4))
      val pinned = t("pairs materialize")(pairs.localCheckpoint())
      println(s"  n_pairs=${pinned.count()}")
      val cc = t("cc rounds")(Dedup.connectedComponents(pinned))
      println(s"  n_labeled=${cc.count()}")
      val full = t("cc end-to-end (unpinned pairs)")(Dedup.connectedComponents(pairs).count())
      println(s"  full=$full")
    }
    spark.stop()
  }
}
