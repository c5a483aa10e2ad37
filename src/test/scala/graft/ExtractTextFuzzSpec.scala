package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Seeded randomized tag-soup fuzz for `extract_text`. Idempotence is the
  * fixed-point property a WET-style extractor owes its pipeline: running the
  * cleaner twice must change nothing, or a re-curated corpus silently drifts.
  * Scope: inputs WITHOUT entity references — entity decoding is one-shot BY
  * DESIGN (`&amp;lt;` must yield the literal text `&lt;`, not double-decode
  * to `<`; see the extract_text scaladoc), so the idempotence domain is
  * entity-free markup, and the entity contract is asserted separately.
  */
class ExtractTextFuzzSpec extends SparkTestBase {

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)

  private def genSoup(rnd: Random): String = {
    val words = Array("alpha", "beta", "x", "Gamma9", "_d")
    val tags = Array("div", "p", "a href=\"q\"", "script", "style", "script type=\"t\"",
      "br/", "SPAN", "!DOCTYPE html", "!-- c --")
    val sb = new StringBuilder
    (0 until rnd.nextInt(30)).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 => sb.append('<').append(tags(rnd.nextInt(tags.length))).append('>')
        case 1 => sb.append("</").append(tags(rnd.nextInt(4))).append('>')
        case 2 => sb.append('<') // stray, unterminated
        case 3 => sb.append('>') // stray
        case 4 => sb.append(Seq(" ", "\t", "\n", "  ")(rnd.nextInt(4)))
        case 5 => sb.append("<script>var a = 1 < 2;</script>")
        case 6 => sb.append("<style>.c{color:red}</style>")
        case _ => sb.append(words(rnd.nextInt(words.length))).append(' ')
      }
    }
    sb.toString
  }

  test(s"extract_text is idempotent over 1500 random entity-free tag soups [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    import spark.implicits._
    val soups = (0 until 1500).map(i => (i, genSoup(rnd)))
    val bad = soups.toDF("i", "raw")
      .select(col("i"), col("raw"),
        TextFunctions.extract_text(col("raw")).as("once"))
      .withColumn("twice", TextFunctions.extract_text(col("once")))
      .filter(col("once") =!= col("twice"))
      .select("i", "raw", "once", "twice")
      .collect()
    assert(bad.isEmpty,
      s"seed=$seed: ${bad.length} non-fixed-points, first: ${bad.headOption.mkString}")
  }

  test("entity decoding is deliberately one-shot (the documented non-idempotent domain)") {
    import spark.implicits._
    val out = Seq("&amp;lt;b&amp;gt;", "x &amp;&amp; y", "&lt;script&gt;alert(1)&lt;/script&gt;")
      .toDF("raw")
      .select(TextFunctions.extract_text(col("raw")).as("t"))
      .as[String].collect()
    // one decode: &amp; -> &, producing LITERAL entity text, never markup
    assert(out(0) == "&lt;b&gt;")
    assert(out(1) == "x && y")
    // decoded angle brackets are TEXT: the tag-strip already ran, so a
    // "script block" materialized by entity decode survives as visible text
    assert(out(2) == "<script>alert(1)</script>")
  }
}
