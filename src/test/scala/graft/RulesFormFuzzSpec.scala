package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.quality.{C4Rules, GopherRules}

/** Seeded fuzz pinning the STAGED forms of the rule bundles to their
  * Column-only twins: `GopherRules.withMetricsAndFlags` ≡
  * `metrics`/`flags`, `C4Rules.withClean` ≡ `c4Clean` — the staged forms
  * are the hot path (pq84: 15 s → 0.68 s), and the page-rule logic in
  * `withClean` is a reimplementation, so divergence is a real hazard.
  */
class RulesFormFuzzSpec extends SparkTestBase {

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  private def genDoc(rnd: Random): String = {
    val words = Array("the", "be", "quick", "fox", "x1", "#", "...", "{",
      "javascript", "Lorem", "ipsum", "zig", "1234", "…", "")
    val lineEnds = Array("", ".", "!", "?", "\"", "...", "…")
    val starts = Array("", "- ", "* ", "• ")
    val lines = (0 until rnd.nextInt(8)).map { _ =>
      starts(rnd.nextInt(starts.length)) +
        (0 until rnd.nextInt(10)).map(_ => words(rnd.nextInt(words.length)))
          .mkString(" ") +
        lineEnds(rnd.nextInt(lineEnds.length))
    }
    // occasionally duplicate a line (dup-line rules) or emit empties
    val withDup =
      if (lines.nonEmpty && rnd.nextBoolean()) lines ++ Seq(lines.head)
      else lines
    withDup.mkString("\n")
  }

  test(s"staged rule forms equal their Column-only twins over 1500 fuzz docs [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    import spark.implicits._
    val docs = (0 until 1500).map(i => (i, genDoc(rnd))).toDF("i", "t")
    val p = GopherRules.Params(minWords = 5L, minStopWords = 1L)

    val columnForm = docs.select(col("i"),
      GopherRules.metrics(col("t")).as("m"),
      GopherRules.flags(GopherRules.metrics(col("t")), p).as("f"),
      C4Rules.c4Clean(col("t")).as("c"))
    val stagedForm = C4Rules.withClean(
      GopherRules.withMetricsAndFlags(docs, col("t"), p),
      col("t"), outCol = "c")
      .select(col("i"), col("m"), col("f"), col("c"))

    val diff = columnForm.exceptAll(stagedForm)
      .unionAll(stagedForm.exceptAll(columnForm))
    val bad = diff.collect()
    assert(bad.isEmpty,
      s"${bad.length} rows diverge between staged and Column forms, e.g. ${bad.headOption}")
  }
}
