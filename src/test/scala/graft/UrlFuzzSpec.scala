package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions

/** Seeded randomized fuzz for the URL canonicalizer. Properties:
  *   1. idempotence — canonicalize(canonicalize(u)) == canonicalize(u),
  *      the fixed-point property a dedup key owes its pipeline;
  *   2. no tracking parameter survives;
  *   3. the Spark expression chain equals an independent plain-JVM
  *      reference built from the SAME pattern constants (wiring twin — the
  *      cross-ENGINE semantics are pinned by pq83's DuckDB oracle);
  *   4. registrable-domain extraction equals plain-Scala label logic.
  */
class UrlFuzzSpec extends SparkTestBase {

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  private def genUrl(rnd: Random): String = {
    val schemes = Array("http", "HTTP", "https", "HTTPS", "Https")
    val labels  = Array("example", "News", "blog", "CDN", "a", "x9")
    val tails   = Array("com", "org", "CO.UK", "com.au", "net", "io", "co.jp")
    val segs    = Array("Story", "p", "x", "2024", "a-b_c", "",
      "a%7Eb", "x%7ey", "p%41q", "r%2Fs", "t%3au", "bad%G1", "end%", "d%%7e")
    val track   = Array("utm_source=rss", "utm_medium=a", "fbclid=z9", "gclid=G",
      "msclkid=m", "mc_cid=1", "mc_eid=2", "igshid=ig", "ref_src=tw")
    val real    = Array("id=7", "page=2", "q=Spark", "v=a_B-c",
      "w=%7e", "z=%2f%3A", "pct=100%25")
    val scheme  = schemes(rnd.nextInt(schemes.length))
    val www     = if (rnd.nextBoolean()) "www." else ""
    val host    = (0 until rnd.nextInt(3))
      .map(_ => labels(rnd.nextInt(labels.length)))
      .mkString("", ".", if (rnd.nextInt(4) == 0) ".." else ".") +
      labels(rnd.nextInt(labels.length)) + "." + tails(rnd.nextInt(tails.length))
    val port = rnd.nextInt(5) match {
      case 0 => ":80"
      case 1 => ":443"
      case 2 => ":8080"
      case _ => ""
    }
    val path = (0 until rnd.nextInt(4))
      .map(_ => segs(rnd.nextInt(segs.length)))
      .map("/" + _).mkString + (if (rnd.nextBoolean()) "/" else "")
    val params = new Random(rnd.nextLong())
      .shuffle((0 until rnd.nextInt(4)).map(_ =>
        if (rnd.nextBoolean()) track(rnd.nextInt(track.length))
        else real(rnd.nextInt(real.length))).toList)
    val query = if (params.isEmpty) "" else params.mkString("?", "&", "")
    val frag  = if (rnd.nextInt(3) == 0) "#Sec-2" else ""
    s"$scheme://$www$host$port$path$query$frag"
  }

  /** Independent JVM replica of [[UrlFunctions.url_canonicalize]], built
    * from the same pattern constants via plain java.util.regex.
    */
  private def refCanon(u0: String): String = {
    var u = refPct(u0.trim.replaceAll("#.*$", "")) // step 2 BEFORE case fold
    val m = java.util.regex.Pattern
      .compile(UrlFunctions.AuthorityPrefixRe).matcher(u)
    u = if (m.find()) u.substring(0, m.end()).toLowerCase + u.substring(m.end())
        else u
    u = u.replaceAll("^(https?://)www\\.", "$1")
    u = u.replaceAll("^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    u = u.replaceAll("^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    u = u.replaceAll(UrlFunctions.TrackingParamRe, "$1")
    u = u.replaceAll("([?&])&+", "$1")
    u = u.replaceAll("[?&]+$", "")
    u = u.replaceAll("/+\\?", "?")
    u = u.replaceAll("/+$", "")
    refIdnFold(u)
  }

  /** Imperative replica of [[UrlFunctions.percent_normalize]] (RFC 3986
    * §6.2.2) over the same [[UrlFunctions.UnreservedByHex]] table.
    */
  private def refPct(u: String): String =
    if (!u.contains("%")) u
    else {
      val parts = u.split("%", -1)
      parts.head + parts.tail.map { s =>
        val h = s.take(2).toUpperCase(java.util.Locale.ROOT)
        UrlFunctions.UnreservedByHex.get(h) match {
          case Some(c) => c + s.drop(2)
          case None if h.length == 2 && h.forall(ch =>
            ch.isDigit || (ch >= 'A' && ch <= 'F')) => "%" + h + s.drop(2)
          case _ => "%" + s
        }
      }.mkString
    }

  /** Imperative replica of [[UrlFunctions.idn_host_fold]]: punycode the
    * host via the same JDK IDN entry point iff it carries non-ASCII.
    */
  private def refIdnFold(u: String): String = {
    val m = java.util.regex.Pattern.compile(UrlFunctions.HostRe).matcher(u)
    if (!m.find()) u
    else {
      val host = m.group(1)
      if (host.forall(_ < 128)) u
      else {
        val folded =
          try java.net.IDN.toASCII(host, java.net.IDN.ALLOW_UNASSIGNED)
            .toLowerCase(java.util.Locale.ROOT)
          catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => host }
        u.substring(0, m.start(1)) + folded + u.substring(m.end(1))
      }
    }
  }

  private def refDomain(host: String): String = {
    val p = host.split("\\.", -1)
    if (p.length <= 2) host
    else if (UrlFunctions.MultiLabelSuffixes.contains(p.takeRight(2).mkString(".")))
      p.takeRight(3).mkString(".")
    else p.takeRight(2).mkString(".")
  }

  test(s"url_canonicalize: idempotent, tracking-free, reference-exact over 2000 fuzz URLs [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    import spark.implicits._
    val urls = (0 until 2000).map(i => (i, genUrl(rnd)))
    val out = urls.toDF("i", "u")
      .select(col("i"), col("u"),
        UrlFunctions.url_canonicalize(col("u")).as("once"))
      .withColumn("twice", UrlFunctions.url_canonicalize(col("once")))
      .withColumn("host", UrlFunctions.url_host(col("once")))
      .withColumn("dom", UrlFunctions.url_domain(col("once")))
      // differential twin (r20): the native single-pass expression must
      // equal the original column-expression chain on every fuzzed input
      .withColumn("chain", UrlFunctions.url_canonicalize_chain(col("u")))
      .collect()
    val byI = urls.toMap
    out.foreach { r =>
      val (i, u, once, twice, host, dom) =
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5))
      assert(once === twice, s"[$i] not idempotent: $u -> $once -> $twice")
      assert(once === refCanon(u), s"[$i] expression != reference for $u")
      assert(once === r.getString(6), s"[$i] native != column chain for $u")
      assert(!once.matches(
        ".*[?&](utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)=.*"),
        s"[$i] tracking param survived: $u -> $once")
      assert(host === host.toLowerCase, s"[$i] host not lowercased: $once")
      assert(dom === refDomain(host), s"[$i] domain mismatch for $host")
      assert(byI(i) === u, "row mixup")
    }
  }

  test("equivalence twins collapse: percent forms, hex case, punycode/Unicode hosts") {
    import spark.implicits._
    val families = Seq(
      Seq("https://e.com/a%7Eb", "https://e.com/a%7eb", "https://e.com/a~b"),
      Seq("https://e.com/p?q=%3a", "https://e.com/p?q=%3A"),
      Seq("https://e.com/%41%42c", "https://e.com/ABc"),
      Seq("https://MÜNCHEN.example/x", "https://münchen.example/x",
        "https://xn--mnchen-3ya.example/x"),
      Seq("https://BÜCHER.example/y?utm_source=a",
        "https://xn--bcher-kva.example/y"))
    families.zipWithIndex.foreach { case (fam, fi) =>
      val keys = fam.toDF("u")
        .select(UrlFunctions.url_canonicalize(col("u")))
        .as[String].collect().toSet
      assert(keys.size === 1, s"family $fi did not collapse: $keys")
      assert(keys.head === refCanon(fam.head), s"family $fi != reference")
    }
    // reserved octets and invalid triplets must NOT collapse (decoding %2F
    // would change URL structure — RFC 3986 §2.2)
    val keys = Seq("https://e.com/a%2Fb", "https://e.com/a/b",
        "https://e.com/a%25b", "https://e.com/a%b")
      .toDF("u").select(UrlFunctions.url_canonicalize(col("u")))
      .as[String].collect().toSet
    assert(keys.size === 4, s"reserved/invalid forms over-collapsed: $keys")
  }
}
