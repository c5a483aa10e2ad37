package graft

import org.apache.spark.sql.functions._

import graft.quality.{C4Rules, GopherRules}

/** Gopher rule bundle + C4 line cleaner (pq84/pq85 families): each rule
  * fires on a planted violation and passes on clean prose; the composed
  * gates keep/drop exactly the right documents.
  */
class HeuristicRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val prose =
    ("the quick brown fox jumps over the lazy dog and that " +
      "dog have been with all of us for years be it rain or shine " +
      "today tomorrow and every single day after that too").split(" ")
      .grouped(8).map(_.mkString(" ")).mkString("\n")

  private def metricsOf(text: String) =
    Seq(text).toDF("t")
      .select(GopherRules.metrics(col("t")).as("m"),
        GopherRules.flags(GopherRules.metrics(col("t")),
          GopherRules.Params(minWords = 10L)).as("f"))
      .select("m.*", "f.*").collect().head

  test("gopher: clean prose passes every rule") {
    val r = metricsOf(prose)
    assert(r.getAs[Boolean]("gopher_keep"),
      s"expected keep, got $r")
  }

  test("gopher: each planted violation fires exactly its rule") {
    // all lines bulleted
    val bullets = prose.split("\n").map("- " + _).mkString("\n")
    assert(!metricsOf(bullets).getAs[Boolean]("ok_bullet_lines"))
    // >30% lines ending in ellipsis
    val ell = prose.split("\n").map(_ + "...").mkString("\n")
    assert(!metricsOf(ell).getAs[Boolean]("ok_ellipsis_lines"))
    // hash boilerplate: symbol ratio + alpha fraction
    val hashy = prose + "\n" + Seq.fill(20)("#").mkString(" ")
    val h = metricsOf(hashy)
    assert(!h.getAs[Boolean]("ok_symbol_ratio"))
    assert(!h.getAs[Boolean]("ok_alpha_words"))
    // duplicate lines
    val dup = (Seq.fill(4)(prose.split("\n").head) ++ prose.split("\n"))
      .mkString("\n")
    assert(!metricsOf(dup).getAs[Boolean]("ok_dup_lines"))
    // no stopwords
    val noStop = "zig zag flip flop quux corge grault " * 3
    assert(!metricsOf(noStop.trim).getAs[Boolean]("ok_stopwords"))
    // too short
    assert(!metricsOf("short text here").getAs[Boolean]("ok_word_count"))
    // mean word length out of band (single-char words)
    val shorty = Seq.fill(30)("a b c d").mkString(" ")
    assert(!metricsOf(shorty).getAs[Boolean]("ok_mean_word_len"))
  }

  test("gopher: gopherFilter keeps clean, drops violators") {
    val df = Seq((1L, prose), (2L, prose.split("\n").map("- " + _).mkString("\n")))
      .toDF("id", "text")
    val kept = GopherRules
      .gopherFilter(df, col("text"), GopherRules.Params(minWords = 10L))
      .select("id").as[Long].collect()
    assert(kept.toSeq === Seq(1L))
  }

  test("c4: line rules — punctuation, length, javascript") {
    val doc = Seq(
      "This is a fine prose sentence that stays.",   // kept
      "no terminal punctuation on this line here",   // dropped: punct
      "Too short.",                                  // dropped: <5 words
      "Please enable JavaScript to view the page.",  // dropped: js
      "Another decent sentence survives the pass!"   // kept
    ).mkString("\n")
    val r = Seq(doc).toDF("t")
      .select(C4Rules.c4Clean(col("t")).as("c")).select("c.*")
      .collect().head
    assert(r.getAs[Long]("n_lines_kept") === 2L)
    assert(r.getAs[String]("clean_text") ===
      "This is a fine prose sentence that stays.\n" +
        "Another decent sentence survives the pass!")
    assert(!r.getAs[Boolean]("page_keep")) // only 2 kept lines < 3
  }

  test("c4: page rules — lorem ipsum, brace, min lines; c4Filter rewrites") {
    val good = Seq.fill(3)("A good sentence with enough words here.").mkString("\n")
    val lorem = good + "\nLorem Ipsum dolor sit amet, consectetur."
    val brace = good + "\nif (x) { return; }"
    val df = Seq((1L, good), (2L, lorem), (3L, brace)).toDF("id", "text")
    val out = C4Rules.c4Filter(df, "text").select("id").as[Long].collect()
    assert(out.toSeq === Seq(1L))
    val rewritten = C4Rules.c4Filter(df, "text")
      .select("text").as[String].head()
    assert(rewritten === good)
  }
}
