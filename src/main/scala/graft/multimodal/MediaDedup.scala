package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection for multimodal assets — the media
  * counterpart of the text near-dup ladder (pq04/pq05): per-frame 64-bit
  * block-hash fingerprints, then banded Hamming pairing over frames via the
  * SAME [[graft.dedup.Dedup.simHashBandedPairs]] machinery text uses.
  *
  * A real pHash is a DCT over DECODED pixels; no codec exists in this
  * container, so the fingerprint here is the codec-free structural form:
  * the frame is split into 64 fixed regions and bit `j` is the parity of
  * region `j`'s content hash. The locality property is the one that
  * matters — a LOCALIZED payload edit flips only the touched regions' bits,
  * so Hamming distance tracks how much of the frame changed — and, unlike a
  * codec-bound hash, every bit is replicable in the DuckDB oracle (pq67
  * hash-checks the full fingerprint table). Swapping in a pixel pHash
  * changes one row-local projection and no plan shape.
  *
  * 100 TB shape: fingerprinting is one row-local pass (explode on the
  * container frame index, 64 region hashes per frame, no shuffle); pairing
  * shuffles (band, band_val) buckets of 8-byte fingerprints — frames and
  * payloads never move.
  */
object MediaDedup {

  private val FrameBytes = 256
  private val Regions = 60 // 60-bit fingerprint: Horner fold stays < 2^60, so
                           // the oracle's BIGINT arithmetic can never overflow
  private val RegionBytes = 4

  /** `(asset_id, frame, fp)` — one 60-bit fingerprint per container frame.
    * `assets` is the [[Multimodal.toAssets]] shape; payloads are read as
    * UTF-8 (the pq12 text-as-binary contract — a pixel codec would replace
    * the region source only). The fingerprint covers the frame's first 60
    * 4-byte regions (240 of 256 bytes): bit for region `j` is the parity of
    * `conv(substring(md5(j ':' region_j), 1, 15), 16, 10)`, folded
    * MSB-first by Horner (`acc·2 + parity`). The region index is hashed in
    * so the empty tail of a short final frame contributes per-position (not
    * one shared) bits; short trailing frames still cluster — they ARE
    * structurally near-empty, the media analog of a flat image, which is
    * documented pHash behavior, not a defect.
    */
  def frameFingerprints(assets: DataFrame, minBytes: Int = 0): DataFrame = {
    val framed = assets
      .select(col("asset_id"), decode(col("data"), "UTF-8").as("t"),
        col("meta.n_frames").as("nf"))
      .select(col("asset_id"), col("t"),
        explode(sequence(lit(0L), col("nf") - 1)).as("frame"))
      .withColumn("fs",
        expr(s"substring(t, cast(frame * $FrameBytes + 1 as int), $FrameBytes)"))
      // pairing passes minBytes=1: a payload whose length divides the frame
      // size gets one EMPTY trailing frame (n_frames = len/256 + 1), and
      // empty frames all share one fingerprint — without the filter every
      // such asset pair would "match" on the empty frame
      .filter(length(col("fs")) >= minBytes)
    framed.select(col("asset_id"), col("frame"),
      graft.functions.media_frame_fp(col("fs")).as("fp"))
  }

  /** The pre-native declarative fingerprint (60 interpreted
    * concat→md5→conv→pmod trees per frame) — retained as the
    * independently-derived equivalence oracle for the native expression
    * (MediaDedupSpec) alongside pq67's DuckDB hash check.
    */
  private[graft] def frameFingerprintsDeclarative(
      assets: DataFrame, minBytes: Int = 0): DataFrame = {
    val framed = assets
      .select(col("asset_id"), decode(col("data"), "UTF-8").as("t"),
        col("meta.n_frames").as("nf"))
      .select(col("asset_id"), col("t"),
        explode(sequence(lit(0L), col("nf") - 1)).as("frame"))
      .withColumn("fs",
        expr(s"substring(t, cast(frame * $FrameBytes + 1 as int), $FrameBytes)"))
      .filter(length(col("fs")) >= minBytes)
    val parity: Column => Column = j =>
      pmod(conv(substring(md5(concat(j.cast("string"), lit(":"),
        col("fs").substr(j * RegionBytes + 1, lit(RegionBytes)))), 1, 15), 16, 10)
        .cast("long"), lit(2L))
    val fp = aggregate(
      sequence(lit(0), lit(Regions - 1)), lit(0L),
      (acc, j) => acc * 2 + parity(j))
    framed.select(col("asset_id"), col("frame"), fp.as("fp"))
  }

  /** Asset-level near-duplicate pairs: two assets are near-dups when ANY of
    * their frames agree within Hamming `maxDist` — the standard frame-match
    * form of video near-dup detection. Candidates come from
    * [[graft.dedup.Dedup.simHashBandedPairs]] over the frame fingerprints
    * (pigeonhole-complete for `maxDist < bands`), then frame pairs roll up
    * per asset pair. Output: `(asset_a, asset_b, n_frame_matches,
    * min_dist)`, `asset_a < asset_b`.
    */
  def nearDupAssets(
      assets: DataFrame,
      bands: Int,
      maxDist: Int): DataFrame = {
    val fps = frameFingerprints(assets, minBytes = 1)
      // frame ids globally unique so the generic pair machinery can treat
      // them as plain ids: (asset_id, frame) → asset_id * 2^20 + frame;
      // packed_id raises on frame >= 2^20 or asset_id >= 2^43 instead of
      // silently colliding distinct frames
      .select(graft.functions.packed_id(col("asset_id"), col("frame"), 1048576L).as("id"),
        col("fp").as("simhash"))
    require(60 % bands == 0, s"bands=$bands must divide the 60-bit fingerprint")
    val pairs = graft.dedup.Dedup.simHashBandedPairs(
      fps, bits = 60, bands = bands, maxDist = maxDist)
    pairs
      // `div`, not `/`: Spark's `/` is DOUBLE division, and above 2^53 the
      // mantissa rounds the packed id before the truncating cast — an
      // asset_id past ~2^33 (well inside packed_id's 2^43 bound) could
      // unpack to the NEIGHBORING asset. Integer division is exact at any
      // packable id (the mixToTarget div pattern).
      .select(expr("id_a div 1048576").as("fa"),
        expr("id_b div 1048576").as("fb"), col("dist"))
      .filter(col("fa") =!= col("fb"))
      .select(least(col("fa"), col("fb")).as("asset_a"),
        greatest(col("fa"), col("fb")).as("asset_b"), col("dist"))
      .groupBy(col("asset_a"), col("asset_b"))
      .agg(count(lit(1)).as("n_frame_matches"), min(col("dist")).as("min_dist"))
  }
}
