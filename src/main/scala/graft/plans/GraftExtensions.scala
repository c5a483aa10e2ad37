package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DtMetaDecode, DtMetaEncode, LegacyEnvelopeDecode, LegacyEnvelopeEncode}

/** SQL surface of the engine's custom expressions, registered through the
  * standard `SparkSessionExtensions` mechanism so `spark.sql(...)` users get
  * the same operators as the DataFrame API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)           // or
  *   .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  * }}}
  *
  * then e.g. `SELECT graft_cms_estimate(s, graft_key_bytes(user_id)) FROM
  * (SELECT graft_cms_sketch(graft_key_bytes(user_id), 4096, 6) AS s ...)`.
  *
  * Registered names are prefixed `graft_` to stay clear of builtins. Only
  * expressions whose arguments are expressible in SQL are registered; the
  * descriptor-typed proto codec stays DataFrame-only (a ProtoSchema is a
  * Scala value, not a SQL literal).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      arity: Seq[Int])(builder: Seq[Expression] => Expression): Unit = {
    val fb: FunctionBuilder = { args =>
      if (!arity.contains(args.size))
        throw new IllegalArgumentException(
          s"$name takes ${arity.mkString(" or ")} arguments, got ${args.size}")
      builder(args)
    }
    ext.injectFunction((FunctionIdentifier(name), info(name, usage), fb))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_cms_sketch",
      "graft_cms_sketch(keyBytes[, width, depth]) - CMS sketch aggregate over binary keys",
      Seq(1, 3)) {
      case Seq(key) => CmsSketchAgg(key).toAggregateExpression()
      case Seq(key, w, d) =>
        CmsSketchAgg(key, intLit(w, "width"), intLit(d, "depth")).toAggregateExpression()
    }
    register(ext, "graft_cms_estimate",
      "graft_cms_estimate(sketch, keyBytes) - upper-bound count of key in sketch", Seq(2)) {
      case Seq(s, k) => CmsEstimate(s, k)
    }
    register(ext, "graft_cms_merge",
      "graft_cms_merge(sketch) - aggregate merging serialized CMS sketches", Seq(1)) {
      case Seq(s) => CmsMergeAgg(s).toAggregateExpression()
    }
    register(ext, "graft_vector_dot",
      "graft_vector_dot(a, b) - double-precision left-fold dot product", Seq(2)) {
      case Seq(a, b) => VectorDot(a, b)
    }
    register(ext, "graft_vector_dot_long",
      "graft_vector_dot_long(a, b) - exact integer dot product over array<long>", Seq(2)) {
      case Seq(a, b) => VectorDotLong(a, b)
    }
    register(ext, "graft_dt_meta_decode",
      "graft_dt_meta_decode(bytes) - decode the dt_meta task header (null on malformed)", Seq(1)) {
      case Seq(b) => DtMetaDecode(b)
    }
    register(ext, "graft_dt_meta_encode",
      "graft_dt_meta_encode(struct) - encode a task metadata struct to dt_meta bytes", Seq(1)) {
      case Seq(s) => DtMetaEncode(s)
    }
    register(ext, "graft_legacy_decode",
      "graft_legacy_decode(bytes) - decode the legacy value envelope (null on malformed)", Seq(1)) {
      case Seq(b) => LegacyEnvelopeDecode(b)
    }
    register(ext, "graft_legacy_encode",
      "graft_legacy_encode(metaStruct, taskBytes) - encode the legacy value envelope", Seq(2)) {
      case Seq(m, t) => LegacyEnvelopeEncode(m, t)
    }
    register(ext, "graft_minhash_sigs",
      "graft_minhash_sigs(text, shingleSize, k) - k minhash values over character shingles", Seq(3)) {
      case Seq(t, s, k) => MinHashSigs(t, intLit(s, "shingleSize"), intLit(k, "k"))
    }
    register(ext, "graft_sim_hash",
      "graft_sim_hash(text, bits) - token-vote simhash fingerprint", Seq(2)) {
      case Seq(t, b) => SimHash(t, intLit(b, "bits"))
    }
    register(ext, "graft_word_ngram_hashes",
      "graft_word_ngram_hashes(text, n) - portable 60-bit hash of every n-token window", Seq(2)) {
      case Seq(t, n) => WordNgramHashes(t, intLit(n, "n"))
    }
    register(ext, "graft_media_frame_fp",
      "graft_media_frame_fp(frame) - 60-bit perceptual block-hash of a media frame string", Seq(1)) {
      case Seq(f) => MediaFrameFingerprint(f)
    }
    register(ext, "graft_compression_ratio_pm",
      "graft_compression_ratio_pm(text) - level-6 zlib bytes per mille of the raw length", Seq(1)) {
      case Seq(t) => CompressionRatioPm(t)
    }
    register(ext, "graft_bucket_hist",
      "graft_bucket_hist(bucket, n) - aggregate: fixed-width histogram -> array<long>", Seq(2)) {
      case Seq(b, n) =>
        BucketHistAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(b, org.apache.spark.sql.types.LongType),
          intLit(n, "n")).toAggregateExpression()
    }
    register(ext, "graft_top_k_by",
      "graft_top_k_by(score, id, k) - bounded-heap exact top-k aggregate -> array<struct<id,score>>",
      Seq(3)) {
      case Seq(s, id, k) =>
        // the heap buffer stores primitive (double, long) — cast like the
        // DataFrame wrapper does
        TopKByScoreAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(s, org.apache.spark.sql.types.DoubleType),
          org.apache.spark.sql.catalyst.expressions.Cast(id, org.apache.spark.sql.types.LongType),
          intLit(k, "k")).toAggregateExpression()
    }
    register(ext, "graft_bottom_k_distinct",
      "graft_bottom_k_distinct(v, k) - KMV sketch aggregate: k smallest distinct longs -> array<long>",
      Seq(2)) {
      case Seq(v, k) =>
        BottomKDistinctAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(v, org.apache.spark.sql.types.LongType),
          intLit(k, "k")).toAggregateExpression()
    }
  }
}
