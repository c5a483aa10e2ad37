package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.similarity.Knn
import graft.multimodal.Multimodal

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup keeps one id per distinct content") {
    val d = Tables.documents(spark, sfDir)
    val out = Dedup.exactByContent(d, col("doc_id"), col("text"))
    assert(out.count() == d.select("text").distinct().count())
    assert(out.agg(sum("n_copies")).as[Long].head() == d.count())
  }

  test("LSH candidate pairs find the planted near-duplicates") {
    val d = Tables.documents(spark, sfDir)
    val sigs = Dedup.minHashSignatures(d, col("doc_id"), col("text"), k = 16, shingleSize = 5)
    val pairs = Dedup.lshCandidatePairs(Dedup.lshBandSignatures(sigs, 16, 4))
    // ground truth: pairs with word-3gram jaccard >= 0.8 (planted dups)
    val truth = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"), lit(1), 3, 4, 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture should contain near-duplicates")
    val found = pairs.as[(Long, Long)].collect().toSet
    val recall = truth.count(found.contains).toDouble / truth.size
    assert(recall >= 0.9, s"LSH recall $recall too low (found ${found.size}, truth ${truth.size})")
  }

  test("simhash of near-duplicate docs is close in Hamming distance") {
    val d = Tables.documents(spark, sfDir)
    val sims = Dedup.simHash(d, col("doc_id"), col("text"), bits = 32)
    val truth = Dedup.ngramJaccardPairs(d, col("doc_id"), col("text"), lit(1), 3, 4, 5)
    val joined = truth
      .join(sims.withColumnRenamed("id", "id_a").withColumnRenamed("simhash", "sh_a"), "id_a")
      .join(sims.withColumnRenamed("id", "id_b").withColumnRenamed("simhash", "sh_b"), "id_b")
      .select(expr("bit_count(sh_a ^ sh_b)").as("dist")).as[Int].collect()
    assert(joined.nonEmpty)
    val avgDist = joined.sum.toDouble / joined.length
    assert(avgDist <= 6.0, s"near-dups should have low simhash distance, got avg $avgDist")
  }

  test("banded simhash candidates equal blocked-exhaustive pairs (pigeonhole)") {
    val d = Tables.documents(spark, sfDir)
    val sims = Dedup.simHash(d, col("doc_id"), col("text"), bits = 32)
    // exhaustive ground truth within maxDist (single block = all pairs)
    val exhaustive = Dedup.simHashNearPairs(sims.withColumn("blk", lit(1)), col("blk"), maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simHashBandedPairs(sims, bits = 32, bands = 4, maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == exhaustive,
      s"banded ${banded.size} vs exhaustive ${exhaustive.size}")
  }

  test("embedding near-pairs are symmetric-free and above threshold") {
    val e = Tables.embeddings(spark, sfDir)
    val pairs = Dedup.embeddingNearPairs(e, col("vec_id"), col("embedding"), lit(1), 0.4)
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }

  test("LSH-bucketed embedding near-dup pairs are a sound subset of all-pairs") {
    val e = Tables.embeddings(spark, sfDir)
    val allPairs = Dedup.embeddingNearPairs(e, col("vec_id"), col("embedding"), lit(1), 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val buckets = graft.similarity.Knn.lshBuckets(e, "vec_id", "embedding", planes = 4)
      .withColumnRenamed("id", "vec_id")
    val lshPairs = Dedup.embeddingNearPairs(
        e.join(buckets, "vec_id"), col("vec_id"), col("embedding"), col("bucket"), 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lshPairs.subsetOf(allPairs), "bucketing must not invent pairs")
    if (allPairs.nonEmpty) {
      val recall = lshPairs.size.toDouble / allPairs.size
      assert(recall > 0.0, "bucketed path found none of the near pairs")
    }
  }

  test("sign-LSH knn achieves nonzero recall vs brute force at k=5") {
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") % 50 === 0)
    val brute = Knn.bruteForceTopK(e, queries, "vec_id", "embedding", 5)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val lsh = Knn.signLshTopK(e, queries, "vec_id", "embedding", 5, planes = 4)
      .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty && lsh.nonEmpty)
    val recall = brute.count(lsh.contains).toDouble / brute.size
    // 4 planes / 16 buckets on random 64-dim data: recall is limited by
    // bucket occupancy; assert it beats random-candidate recall by a margin
    assert(recall >= 0.15, s"LSH recall $recall below floor")
  }

  test("multimodal decode produces one feature row per sampled frame") {
    val d = Tables.documents(spark, sfDir).withColumn("payload", col("text").cast("binary"))
    val assets = Multimodal.toAssets(d, "doc_id", "payload", "text/fake")
    val feats = Multimodal.decodeFeatures(assets, stride = 1, dim = 8)
    val expected = assets.agg(sum(col("meta.n_frames"))).as[Long].head()
    assert(feats.count() == expected)
    assert(feats.head().feature.length == 8)
    // determinism: same input → same features
    val a = feats.filter(_.asset_id == 0L).collect().map(_.feature.toSeq).toSet
    val b = Multimodal.decodeFeatures(assets, 1, 8).filter(_.asset_id == 0L)
      .collect().map(_.feature.toSeq).toSet
    assert(a == b)
  }
}
