package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: images/audio/video ride through the engine as
  * opaque `binary` payloads with a typed metadata struct; decode/extract runs
  * partition-parallel over the bytes.
  *
  * The actual codec step is a STUB in this environment (no image/audio
  * libraries in the container): [[FakeCodec]] produces deterministic features
  * from the bytes. The Spark-side contract — schema, partitioning, batch
  * shape, executor-side decode in `mapPartitions`, never on the driver — is
  * real and tested; swapping FakeCodec for a JNI/javacv decoder changes no
  * plan shape.
  */
object Multimodal {

  /** Asset schema: payload + typed metadata, the engine-visible shape. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("n_frames", LongType, nullable = false))), nullable = false)))

  /** Wrap arbitrary binary payloads into the asset shape. `n_frames` models a
    * frame-per-256-bytes container — the stub's deterministic stand-in for a
    * real container index.
    */
  def toAssets(df: DataFrame, idCol: String, binCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(binCol).as("data"),
      struct(
        coalesce(octet_length(col(binCol)).cast("long"), lit(0L)).as("byte_len"),
        lit("fake/v1").as("format"),
        (floor(coalesce(octet_length(col(binCol)).cast("long"), lit(0L)) / 256).cast("long") + 1)
          .as("n_frames")).as("meta"))

  final case class DecodedFeature(asset_id: Long, frame: Long, feature: Array[Float])

  final case class AssetMeta(byte_len: Long, format: String, n_frames: Long)
  final case class Asset(asset_id: Long, media_type: String, data: Array[Byte], meta: AssetMeta)

  /** Executor-side "resize": re-encode every frame at `scalePct` percent —
    * the payload-transform plumbing (schema-preserving, meta recomputed from
    * the new payload, decode+re-encode never on the driver). The pixel work
    * is the stub boundary ([[FakeCodec.resizeFrame]]); a real impl swaps the
    * codec and changes no plan shape.
    */
  def resizeAssets(assets: DataFrame, scalePct: Int): Dataset[Asset] = {
    require(scalePct > 0 && scalePct <= 400, s"scalePct out of range: $scalePct")
    implicit val enc = Encoders.product[Asset]
    assets.as[Asset].mapPartitions { rows =>
      rows.map { a =>
        val resized = FakeCodec.resizePayload(a.data, scalePct)
        a.copy(
          data = resized,
          meta = AssetMeta(
            byte_len = if (resized == null) 0L else resized.length.toLong,
            format = a.meta.format,
            n_frames = (if (resized == null) 0L else resized.length.toLong) / 256 + 1))
      }
    }
  }

  /** Frame features → ONE asset-level embedding: per-dimension mean over the
    * sampled frames, summed in 1e-6 fixed point (the pq26 contract) so the
    * pooled vector is bit-identical across partitionings, then divided once.
    * This is the bridge from [[decodeFeatures]]' per-frame output to the
    * `embeddings`-table shape every ANN/dedup operator consumes
    * (bruteForceTopK, ivfTopK, semanticClusterDedup, mmrTopK…) — i.e. the
    * whole multimodal retrieval path is: binary asset → frame features →
    * pooled embedding → ANN, with only the codec stubbed.
    *
    * Scale shape: posexplode to (asset, dim) rows — fixed width, no frame
    * array ever buffered per group — one partial-agged shuffle on
    * (asset, dim), then a dim-bounded collect per asset. Returns
    * (asset_id, embedding: array<float>).
    */
  def meanPoolFeatures(features: Dataset[DecodedFeature]): DataFrame =
    features.toDF()
      .select(col("asset_id"), posexplode(col("feature")).as(Seq("dim", "v")))
      .withColumn("v_fp", floor(col("v").cast("double") * lit(1e6)).cast("long"))
      .groupBy(col("asset_id"), col("dim"))
      .agg(sum(col("v_fp")).as("s_fp"), count(lit(1)).as("n"))
      .withColumn("m",
        (col("s_fp").cast("double") / col("n").cast("double") / lit(1e6)).cast("float"))
      .groupBy(col("asset_id"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        x => x.getField("m")).as("embedding"))

  /** Executor-side "decode + featurize": one feature vector per sampled
    * frame. Frame sampling takes every `stride`-th frame — the plumbing a
    * real video pipeline needs (explode on the container index, not on
    * pixels). Decode is the stub boundary.
    */
  def decodeFeatures(assets: DataFrame, stride: Int, dim: Int): Dataset[DecodedFeature] = {
    // validate on the driver: stride=0 throws "step cannot be 0" inside
    // every task; a NEGATIVE stride yields an empty range per asset — the
    // stage would SUCCEED with zero features and downstream retrieval would
    // be silently empty (resizeAssets' require pattern)
    require(stride > 0, s"stride=$stride must be positive")
    require(dim > 0, s"dim=$dim must be positive")
    implicit val enc = Encoders.product[DecodedFeature]
    assets.select(col("asset_id"), col("data"), col("meta.n_frames").as("n_frames"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.get(1).asInstanceOf[Array[Byte]]
          val nFrames = r.getLong(2)
          (0L until nFrames by stride.toLong).map { f =>
            DecodedFeature(id, f, FakeCodec.decodeFrame(bytes, f, dim))
          }
        }
      }
  }
}

/** Deterministic stand-in for the real media codec (??? in this container:
  * no libjpeg/ffmpeg). Features are a seeded hash-walk over the frame bytes —
  * stable across runs and partitions, which is all the pipeline tests need.
  */
object FakeCodec extends Serializable {
  /** Deterministic stand-in for a frame-wise resize: output length scales by
    * `scalePct`, content is a stable byte-walk of the input (same input +
    * scale ⇒ same output on any executor).
    */
  def resizePayload(bytes: Array[Byte], scalePct: Int): Array[Byte] = {
    if (bytes == null) return null
    // size the output in Long and refuse to exceed array bounds: a 600 MB
    // payload at 400% would wrap Int and silently truncate to 1 byte
    val target = bytes.length.toLong * scalePct / 100
    require(target <= Int.MaxValue - 8, s"resized payload too large: $target bytes")
    val outLen = math.max(1L, target).toInt
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = if (bytes.isEmpty) 0 else bytes((i.toLong * bytes.length / outLen).toInt)
      i += 1
    }
    out
  }

  def decodeFrame(bytes: Array[Byte], frame: Long, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    val start = (frame * 256).toInt
    var h = 1125899906842597L ^ frame
    var i = 0
    while (i < dim) {
      val b: Int = if (bytes != null && bytes.nonEmpty) bytes(((start + i) % bytes.length + bytes.length) % bytes.length) & 0xff else 0
      h = h * 31 + b
      out(i) = ((h % 1000L).toFloat) / 1000.0f
      i += 1
    }
    out
  }
}
