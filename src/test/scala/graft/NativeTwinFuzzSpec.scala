package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.TextFunctions

/** Seeded differential fuzz of the native Catalyst expressions against
  * their retained declarative twins, over ADVERSARIAL inputs the corpus
  * equivalence specs never produce: astral-plane emoji (surrogate pairs in
  * UTF-16, 4-byte sequences in UTF-8 — exactly where a byte-indexed native
  * loop and a Catalyst string op could disagree), combining marks,
  * zero-width joiners, CJK, repeated separators, empty/whitespace-only
  * strings, huge single tokens; and for the vector twins, zero vectors,
  * denormals, extreme magnitudes, and mixed signs. One Spark job per twin
  * per run: all cases ride one DataFrame and the twins diff row-wise.
  *
  * Replay: sbt 'set Test/javaOptions += "-Dgraft.fuzz.seed=<base>"'
  *             "testOnly graft.NativeTwinFuzzSpec"
  */
class NativeTwinFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)

  /** Random text spanning the unicode shapes above. */
  private def randomTexts(rnd: Random, n: Int): Seq[String] = {
    val atoms = Array(
      "alpha", "beta", "tok", "x", "0042", "...", "??", "a-b",
      "你好", "日本語",                    // CJK
      "😀", "🤖", "👨‍💻", // emoji, ZWJ sequence
      "é", "ñ",                                     // combining marks
      "​", " ",                                       // zero-width space, NBSP (inside tokens)
      "رسالة",                         // RTL arabic
      "x" * 300)                                                // huge token
    val fixed = Seq("", " ", "  ", "a", " lead", "trail ", "a  b", "   ")
    fixed ++ Seq.fill(n - fixed.size) {
      val len = rnd.nextInt(12)
      (0 until len).map { _ =>
        if (rnd.nextInt(10) == 0) "" else atoms(rnd.nextInt(atoms.length))
      }.mkString(" ")
    }
  }

  private def textDf(rnd: Random, n: Int, withNull: Boolean): DataFrame = {
    val rows = randomTexts(rnd, n).zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      (if (withNull) Seq((999999L, null: String)) else Nil)
    rows.toDF("doc_id", "text")
  }

  private def assertNoDiff(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = a.columns.toSeq
    assert(b.columns.toSeq == cols, s"$what: twin schemas diverge")
    // null-safe full-row comparison both directions (catches missing rows too)
    val diff = a.exceptAll(b).limit(5).collect() ++ b.exceptAll(a).limit(5).collect()
    assert(diff.isEmpty, s"$what diverged (seed $seed): ${diff.mkString("; ")}")
  }

  test(s"canonicalize: native == declarative on adversarial unicode (base $seed)") {
    info(s"fuzz seed base: $seed")
    val df = textDf(new Random(seed), 1200, withNull = true)
    assertNoDiff(
      df.select(col("doc_id"), Dedup.canonicalize(col("text")).as("c")),
      df.select(col("doc_id"), Dedup.canonicalizeDeclarative(col("text")).as("c")),
      "canonicalize")
  }

  test(s"minhash signatures: native == declarative (base $seed)") {
    val df = textDf(new Random(seed ^ 1), 800, withNull = false)
    val k = 8
    // the declarative twin drops shingle-less docs via its explode;
    // restrict both sides to docs with at least one shingle
    val native = Dedup.minHashSignaturesWide(df, col("doc_id"), col("text"), k, 5)
    val decl = Dedup.declarativeMinHashSignaturesWide(df, col("doc_id"), col("text"), k, 5)
    assertNoDiff(native, decl, "minhash")
  }

  test(s"simhash: native == declarative (base $seed)") {
    val df = textDf(new Random(seed ^ 2), 800, withNull = false)
    val native = df.select(col("doc_id").as("id"),
      graft.functions.sim_hash(col("text"), 48).as("simhash"))
    val decl = Dedup.declarativeSimHash(df, col("doc_id"), col("text"), bits = 48)
    assertNoDiff(native, decl, "simhash")
  }

  test(s"winnow fingerprints: native == declarative (base $seed)") {
    val df = textDf(new Random(seed ^ 3), 800, withNull = true)
    assertNoDiff(
      df.select(col("doc_id"), TextFunctions.winnow_fingerprints(col("text"), 3, 4).as("fp")),
      df.select(col("doc_id"),
        TextFunctions.declarative_winnow_fingerprints(col("text"), 3, 4).as("fp")),
      "winnow")
  }

  test(s"repeated-segment removal: native == declarative (base $seed)") {
    val rnd = new Random(seed ^ 4)
    // force repeats: half the docs are built from a tiny atom pool so the
    // same 3-token segment recurs
    val repeaty = Seq.fill(400) {
      val pool = Array("a", "b", "😀", "你")
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString(" ")
    }
    val rows = (randomTexts(rnd, 400) ++ repeaty).zipWithIndex
      .map { case (t, i) => (i.toLong, t) } :+ ((999999L, null: String))
    val df = rows.toDF("doc_id", "text")
    assertNoDiff(
      TextFunctions.dropRepeatedSegments(df, col("doc_id"), col("text"), 3),
      TextFunctions.dropRepeatedSegmentsDeclarative(df, col("doc_id"), col("text"), 3),
      "dropRepeatedSegments")
  }

  private def randomVectors(rnd: Random, n: Int, dim: Int): DataFrame = {
    val special = Seq(
      Array.fill(dim)(0f),                      // zero vector
      Array.fill(dim)(1e-38f),                  // denormal-ish
      Array.fill(dim)(3e38f),                   // huge
      Array.tabulate(dim)(i => if (i % 2 == 0) 1f else -1f))
    val rows = (special ++ Seq.fill(n - special.size)(
      Array.fill(dim)((rnd.nextFloat() - 0.5f) * math.pow(10, rnd.nextInt(8) - 4).toFloat)))
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
    rows.toDF("vec_id", "embedding")
  }

  test(s"sign-LSH buckets: native == declarative (base $seed)") {
    val df = randomVectors(new Random(seed ^ 5), 600, dim = 16)
    assertNoDiff(
      graft.similarity.Knn.lshBuckets(df, "vec_id", "embedding", planes = 12),
      graft.similarity.Knn.declarativeLshBuckets(df, "vec_id", "embedding", planes = 12),
      "signLsh")
  }

  test(s"PQ encode: native == declarative (base $seed)") {
    val df = randomVectors(new Random(seed ^ 6), 600, dim = 16)
    val cb = graft.similarity.Pq.syntheticCodebooks(m = 4, k = 8, w = 4)
    assertNoDiff(
      df.select(col("vec_id"), graft.similarity.Pq.codesFor(col("embedding"), cb).as("codes")),
      df.select(col("vec_id"),
        graft.similarity.Pq.codesForDeclarative(col("embedding"), cb).as("codes")),
      "pqEncode")
  }
}
