package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.quality.GopherRules

/** Main-content extraction ([[graft.plans.MainContentExpr]], the
  * jusText/Boilerpipe-class block scorer): block segmentation and the
  * length/link-density/stop-word classification, the context-promotion
  * rule, null handling — and the point of the tier: the Gopher gate's
  * accuracy on boilerplate-wrapped pages improves when it judges
  * `main_content` output instead of `extract_text` output.
  */
class MainContentSpec extends SparkTestBase {
  import spark.implicits._

  private def mc(
      html: String,
      minLen: Int = 80,
      maxLinkDensity: Double = 0.33,
      minStopFrac: Double = 0.0,
      contextPass: Boolean = true): (Int, Int, String) = {
    val r = Seq(html).toDF("h")
      .select(TextFunctions.main_content(
        col("h"), minLen, maxLinkDensity, minStopFrac, contextPass).as("m"))
      .select("m.n_blocks", "m.n_content", "m.text_main")
      .head()
    (r.getInt(0), r.getInt(1), r.getString(2))
  }

  private val prose =
    "the old maps of this town have been kept with care in a dry cellar " +
      "for many years and the people that live here still read them often"

  test("boilerplate blocks drop: nav and footer are link-dense, banners are short") {
    val html =
      s"""<html><head><title>t</title></head><body>
         |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
         |<div>Accept our cookies. <a href="/p">Learn more</a></div>
         |<p>$prose</p>
         |<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> (c) Example</footer>
         |</body></html>""".stripMargin
    val (blocks, content, main) = mc(html)
    assert(blocks == 4, s"nav, banner, prose, footer — got $blocks")
    assert(content == 1 && main == prose)
  }

  test("stop-word signal: keyword stuffing without stopwords is boilerplate at minStopFrac>0") {
    val stuffing = Seq.fill(30)("cheap discount luxury watches replica brands").mkString(" ")
    val html = s"<body><p>$stuffing</p><p>$prose $prose</p></body>"
    // without the stoplist signal both long blocks pass...
    val (_, lax, _) = mc(html)
    assert(lax == 2)
    // ...with it, only the prose (stop-word-dense) survives
    val (_, strict, main) = mc(html, minStopFrac = 0.15)
    assert(strict == 1 && main == s"$prose $prose")
  }

  test("context pass promotes a short clean block BETWEEN content, never at the page edge") {
    val headline = "A short headline here"
    val html =
      s"""<body><h1>$headline</h1><p>$prose $prose</p>
         |<h2>$headline</h2>
         |<p>$prose $prose</p></body>""".stripMargin
    val (_, n, main) = mc(html)
    // the inner h2 is sandwiched between two content paragraphs → promoted;
    // the leading h1 has no content ABOVE it → stays boilerplate
    assert(n == 3, s"expected inner headline promoted, got $n content blocks")
    assert(main == s"$prose $prose\n$headline\n$prose $prose")
    val (_, noCtx, _) = mc(html, contextPass = false)
    assert(noCtx == 2, "promotion off: only the two paragraphs")
  }

  test("null html and empty pages come out as the honest empty document") {
    val r = Seq[Option[String]](None).toDF("h")
      .select(TextFunctions.main_content(col("h")).as("m"))
      .select("m.n_blocks", "m.n_content", "m.text_main").head()
    assert((r.getInt(0), r.getInt(1), r.getString(2)) == ((0, 0, "")))
    assert(mc("<html><body></body></html>") == ((0, 0, "")))
  }

  test("entity decode and whitespace collapse match extract_text's rules inside blocks") {
    val html = "<body><p>a &amp;lt; b   and&nbsp;more of the text that we have " +
      "kept with the care it deserves for the readers of this piece</p></body>"
    val (_, n, main) = mc(html)
    assert(n == 1)
    assert(main.startsWith("a &lt; b and more"), s"got: $main")
  }

  test("Gopher gate accuracy improves on boilerplate-wrapped pages (the tier's purpose)") {
    // good docs: long prose (passes Gopher on its own); bad docs: 33 words
    // (fails the 50-word floor on its own). The boilerplate wrap adds ~30
    // alpha words with plenty of stopwords — enough to push a bad doc OVER
    // the word floor when the gate reads extract_text output.
    val goodBody = s"$prose $prose $prose"
    val badBody = Seq.fill(3)(
      "the old maps of this town have been kept with care").mkString(" ")
    def wrap(body: String): String =
      s"""<html><head><title>d</title></head><body>
         |<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a> <a href="/l">Login</a></nav>
         |<div><a href="/cookies">Learn more about the cookies that we have to use and the terms of the site with all of the details</a></div>
         |<p>$body</p>
         |<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> <a href="/c">Contact</a></footer>
         |</body></html>""".stripMargin
    val docs = (0 until 10).map { i =>
      val good = i % 2 == 0
      (i.toLong, wrap(if (good) goodBody else badBody), good)
    }.toDF("id", "html", "label_keep")
    def gateAccuracy(textOf: org.apache.spark.sql.Column): Long =
      docs.select(col("label_keep"),
          GopherRules.flags(GopherRules.metrics(textOf)).getField("gopher_keep").as("kept"))
        .where(col("kept") === col("label_keep")).count()
    val viaExtract = gateAccuracy(TextFunctions.extract_text(col("html")))
    val viaMain = gateAccuracy(
      TextFunctions.main_content(col("html")).getField("text_main"))
    assert(viaMain == 10L,
      s"gate over main_content must classify all 10 correctly, got $viaMain")
    assert(viaExtract < viaMain,
      s"boilerplate-diluted gate must misclassify (got $viaExtract vs $viaMain) — " +
        "otherwise this fixture proves nothing")
  }
}
