package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaDedup, Multimodal}

/** Perceptual media near-dup: fingerprint locality, planted-mutation
  * detection, and the empty-trailing-frame guard (pq67 hash-checks the
  * fingerprint table itself).
  */
class MediaDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def assetsOf(rows: Seq[(Long, String)]) =
    Multimodal.toAssets(
      rows.toDF("doc_id", "text").withColumn("payload", col("text").cast("binary")),
      "doc_id", "payload", "text/fake")

  // deterministic 512-char payload per seed: full frames, distinct content
  private def payload(seed: Int): String =
    Seq.tabulate(512)(i => ('a' + (i * 31 + seed * 97) % 26).toChar).mkString

  test("native fingerprint equals the declarative form bit-for-bit") {
    val assets = assetsOf((0 until 10).map(i => (i.toLong, payload(i))) :+
      (10L, payload(0).take(137)) :+ (11L, "") :+ (12L, payload(3) + "tail"))
    val a = MediaDedup.frameFingerprints(assets)
      .as[(Long, Long, Long)].collect().toSet
    val b = MediaDedup.frameFingerprintsDeclarative(assets)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b, "native media fingerprint diverged from the declarative oracle")
  }

  test("a localized edit flips few fingerprint bits; unrelated payloads differ in many") {
    val base = payload(1)
    val oneRegionEdit = base.updated(10, 'Z').updated(11, 'Z') // inside region 2 of frame 0
    val fps = MediaDedup.frameFingerprints(assetsOf(Seq(
        1L -> base, 2L -> oneRegionEdit, 3L -> payload(2))))
      .filter(col("frame") === 0)
      .select("asset_id", "fp").as[(Long, Long)].collect().toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(fps(a) ^ fps(b))
    assert(dist(1L, 2L) <= 1, s"one-region edit flipped ${dist(1L, 2L)} bits")
    assert(dist(1L, 3L) >= 15, s"unrelated frames only ${dist(1L, 3L)} bits apart")
  }

  test("near-dup pairing finds planted mutations and not unrelated assets") {
    val originals = (0 until 12).map(i => (i.toLong, payload(i)))
    // mutate two regions of frame 1 of assets 0..3 → dist ≤ 2 on that frame
    val mutated = (0 until 4).map { i =>
      val t = originals(i)._2
      (100L + i, t.substring(0, 300) + "XX" + t.substring(302))
    }
    val pairs = MediaDedup.nearDupAssets(
        assetsOf(originals ++ mutated), bands = 6, maxDist = 5)
      .select("asset_a", "asset_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 4).map(i => (i.toLong, 100L + i)).toSet
    assert(planted.subsetOf(pairs), s"missed planted pairs: ${planted -- pairs}")
    assert(pairs == planted, s"spurious pairs: ${pairs -- planted}")
  }

  test("asset ids past double precision (2^53 packed) unpack exactly in pairing") {
    // packed id = asset_id * 2^20 + frame; at asset_id ~ 2^42 the packed id
    // sits near 2^62, where DOUBLE division rounds the mantissa by up to
    // 2^9 — a `/`-based unpack could emit the NEIGHBORING asset id. The
    // planted near-identical pair must come back with its exact huge ids.
    val big = 1L << 42
    val t = payload(7)
    val rows = Seq((big, t), (big + 1, t.substring(0, 300) + "XX" + t.substring(302)),
      (big + 7, payload(3)))
    val pairs = MediaDedup.nearDupAssets(assetsOf(rows), bands = 6, maxDist = 5)
      .select("asset_a", "asset_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((big, big + 1)),
      s"huge packed ids must unpack exactly, got $pairs")
  }

  test("frame-size-divisible payloads do not all pair on the shared empty trailing frame") {
    val rows = (0 until 6).map(i => (i.toLong, payload(i))) // 512 = 2·256 ⇒ empty frame 2
    val pairs = MediaDedup.nearDupAssets(assetsOf(rows), bands = 6, maxDist = 5)
    assert(pairs.isEmpty, "empty trailing frames created universal matches")
    // but the registered fingerprint table (minBytes = 0) does carry them,
    // one shared fp per empty frame — the oracle-checked contract
    val fps = MediaDedup.frameFingerprints(assetsOf(rows))
    assert(fps.filter(col("frame") === 2).select("fp").distinct().count() == 1)
  }
}
