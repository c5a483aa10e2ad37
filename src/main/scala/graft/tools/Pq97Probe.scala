package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Cost attribution for pq97 (deletion re-election) — the r18 verdict's
  * unattributed 2.6 s: split the registered query's wall time into the
  * LSH pair build, the full-corpus CC, and the re-election itself, and
  * measure the pinned-vs-unpinned pair lineage (the registered shape
  * evaluates the unpinned LSH subtree once per CC materialization).
  * Scratch probe, not part of the driver contract.
  */
object Pq97Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    def lshPairs() = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      val sigs = Dedup.minHashSignaturesWide(d, col("doc_id"), col("text"), k = 16, shingleSize = 5)
      (d, Dedup.lshCandidatePairs(Dedup.lshBandSignaturesWide(sigs, k = 16, bands = 4)))
    }

    // warm the JIT/codegen once
    { val (d, p) = lshPairs(); p.localCheckpoint(); d.count(); () }

    def rep(): Map[String, Double] = {
      // stage 1: the LSH pair build, pinned
      val (dp, t0) = timed { val (d, p) = lshPairs(); (d, p.localCheckpoint()) }
      val (d, pinned) = dp
      // stage 2: full-corpus CC over the pinned pairs
      val (clusters, t1) = timed(Dedup.connectedComponents(pinned))
      // stage 3: the re-election itself, everything upstream pinned
      val removed = d.select(col("doc_id")).filter(col("doc_id") % 5 === 0)
      val (_, t2) = timed {
        Dedup.reElectAfterDeletion(pinned, clusters, removed)
          .write.format("noop").mode("overwrite").save()
      }
      // the registered (unpinned) shape end to end, for the delta
      val (_, t3) = timed {
        val (d2, p2) = lshPairs()
        val c2 = Dedup.connectedComponents(p2)
        val r2 = d2.select(col("doc_id")).filter(col("doc_id") % 5 === 0)
        Dedup.reElectAfterDeletion(p2, c2, r2)
          .write.format("noop").mode("overwrite").save()
      }
      Map("lsh_pairs_sec" -> t0, "full_cc_sec" -> t1, "reelect_sec" -> t2,
        "pinned_total_sec" -> (t0 + t1 + t2), "unpinned_total_sec" -> t3)
    }

    // bisect INSIDE the re-elect (mirrors Dedup.reElectAfterDeletion's
    // stages so each can be timed; the operator itself stays one unit)
    def reelectBisect(): Map[String, Double] = {
      val (d0, p0) = lshPairs()
      val pinned = p0.localCheckpoint()
      val clusters = Dedup.connectedComponents(pinned)
      val removedIds = d0.select(col("doc_id")).filter(col("doc_id") % 5 === 0)
      val removed = broadcast(removedIds.toDF("__rm").dropDuplicates("__rm"))
      val (affected, tAff) = timed {
        val a = broadcast(
          clusters.join(removed, col("id") === col("__rm"), "left_semi")
            .select(col("cluster_id").as("__ac")).distinct())
        a.count(); a
      }
      val (subPairs, tSub) = timed {
        val sp = pinned
          .join(clusters.select(col("id").as("id_a"), col("cluster_id")), Seq("id_a"))
          .join(affected, col("cluster_id") === col("__ac"), "left_semi")
          .join(removed, col("id_a") === col("__rm"), "left_anti")
          .join(removed, col("id_b") === col("__rm"), "left_anti")
          .select(col("id_a"), col("id_b")).localCheckpoint()
        sp.count(); sp
      }
      val (subCc, tCc) = timed(Dedup.connectedComponents(subPairs))
      val (_, tAgg) = timed {
        clusters.join(affected, col("cluster_id") === col("__ac"), "left_semi")
          .join(removed, col("id") === col("__rm"), "left_anti")
          .select(col("id"), col("cluster_id").as("old_cluster_id"))
          .join(subCc.select(col("id"), col("cluster_id").as("__nc")), Seq("id"), "left")
          .withColumn("__new_cluster", coalesce(col("__nc"), col("id")))
          .groupBy(col("__new_cluster").as("new_keep_id"), col("old_cluster_id"))
          .agg(count(lit(1)).as("n_members"))
          .filter(col("new_keep_id") =!= col("old_cluster_id"))
          .write.format("noop").mode("overwrite").save()
      }
      Map("bisect_affected_sec" -> tAff, "bisect_subpairs_sec" -> tSub,
        "bisect_subcc_sec" -> tCc, "bisect_agg_sec" -> tAgg)
    }

    // the REGISTERED query as the bench would run it (warm reps)
    def registered(): Map[String, Double] = {
      val fn = graft.SparkEntry.queries("pq97_deletion_reelect")
      val (_, t) = timed(fn(spark, dir).write.format("noop").mode("overwrite").save())
      Map("registered_sec" -> t)
    }

    val reps = Seq.fill(3)(rep() ++ reelectBisect() ++ registered())
    def med(k: String): Double = reps.map(_(k)).sorted.apply(1)
    val keys = Seq("lsh_pairs_sec", "full_cc_sec", "reelect_sec",
      "pinned_total_sec", "unpinned_total_sec",
      "bisect_affected_sec", "bisect_subpairs_sec", "bisect_subcc_sec", "bisect_agg_sec",
      "registered_sec")
    println(keys.map(k => f""""$k":${med(k)}%.3f""")
      .mkString("{\"probe\":\"pq97\",", ",", s""","sf":"$dir"}"""))
    spark.stop()
  }
}
