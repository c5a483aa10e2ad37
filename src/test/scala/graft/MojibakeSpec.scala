package graft

import java.nio.charset.{Charset, StandardCharsets}

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.fix_mojibake

/** Mojibake repair ([[graft.plans.FixMojibake]]): exact inversion of the
  * UTF-8-read-as-Windows-1252 defect (single and double application),
  * conservative no-corruption guarantees on clean text, idempotence —
  * pinned cases plus seeded round-trip fuzz where the EXPECTED value is
  * the original string itself (the strongest oracle there is).
  */
class MojibakeSpec extends SparkTestBase {
  import spark.implicits._

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)
  private val cp1252 = Charset.forName("windows-1252")

  /** The defect under repair: UTF-8 bytes misread as Windows-1252. */
  private def breakOnce(s: String): String =
    new String(s.getBytes(StandardCharsets.UTF_8), cp1252)

  private def fix(ss: Seq[String]): Seq[String] =
    ss.toDF("t").select(fix_mojibake(col("t"))).as[String].collect().toSeq

  test("pinned: classic mojibake families repair exactly; clean text untouched") {
    val cases = Seq(
      "cafÃ©" -> "café",
      "donâ€™t" -> "don’t",
      "naÃ¯ve" -> "naïve",
      "dash â€” here" -> "dash — here",
      // no telltale -> untouched, even with genuine accents
      "résumé" -> "résumé",
      "plain ascii." -> "plain ascii.",
      "" -> "",
      // telltale but NOT valid mojibake: bare 'Ã ' fails the strict
      // UTF-8 re-decode and must pass through (the SÃO case)
      "SÃO PAULO" -> "SÃO PAULO",
      // unmappable char next to a telltale: 1252 re-encode fails -> kept
      "Ã© and 中" -> "Ã© and 中",
      // plausibility guard: byte-identical to CJK mojibake (E4 97 93) but
      // minting U+4DD3 from Latin text is rejected — genuine text wins
      "dä—“" -> "dä—“",
      // flip side (documented): actual CJK mojibake is conservatively
      // left untouched rather than risk the case above
      "ä¸­æ–‡" -> "ä¸­æ–‡")
    assert(fix(cases.map(_._1)) === cases.map(_._2))
  }

  test(s"fuzz: single and double mojibake invert exactly; fix is idempotent [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed ^ 0x3017L)
    // NOTE: no '”' (U+201D) in the pool — its UTF-8 tail byte 0x9D is
    // UNDEFINED in Windows-1252, so the breakage itself destroys it
    // (U+FFFD); that unrecoverable case is pinned separately below
    val pool = "éüïàçñöè—’“…äßœ€αж≈" + "abcdefgh .,"
    val originals = (0 until 400).map { _ =>
      (0 until 1 + rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }.filter(_.exists(_ > 127)) // ensure the defect actually bites
    val broken = originals.map(breakOnce)
    assert(fix(broken) === originals, "single mojibake must invert")
    // double application is itself LOSSY for some chars (e.g. ж's broken
    // form 'Ð' re-encodes through the 1252 hole 0x90 -> U+FFFD destroys
    // it at breakage); only losslessly double-broken strings must unwind
    val doubly = originals.zip(broken.map(breakOnce))
      .filter(!_._2.contains('�'))
    assert(doubly.size > originals.size / 3, "fixture: too few lossless doubles")
    assert(fix(doubly.map(_._2)) === doubly.map(_._1),
      "double mojibake must unwind to the original")
    val once = fix(broken)
    assert(fix(once) === once, "fix must be idempotent")
    // the unrecoverable class: a char whose UTF-8 bytes hit a 1252 hole
    // (0x9D for '”') is destroyed AT BREAKAGE (U+FFFD); the repaired
    // string must keep the replacement char rather than corrupt further
    val lossy = breakOnce("he said ”go”")
    assert(lossy.contains('�'), "fixture: breakage must be lossy here")
    assert(fix(Seq(lossy)) === Seq(lossy), "unrecoverable rows pass through")
  }
}
