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
    val segs    = Array("Story", "p", "x", "2024", "a-b_c", "")
    val track   = Array("utm_source=rss", "utm_medium=a", "fbclid=z9", "gclid=G",
      "msclkid=m", "mc_cid=1", "mc_eid=2", "igshid=ig", "ref_src=tw")
    val real    = Array("id=7", "page=2", "q=Spark", "v=a_B-c")
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
    var u = u0.trim.replaceAll("#.*$", "")
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
    u.replaceAll("/+$", "")
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
      .collect()
    val byI = urls.toMap
    out.foreach { r =>
      val (i, u, once, twice, host, dom) =
        (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
          r.getString(4), r.getString(5))
      assert(once === twice, s"[$i] not idempotent: $u -> $once -> $twice")
      assert(once === refCanon(u), s"[$i] expression != reference for $u")
      assert(!once.matches(
        ".*[?&](utm_[a-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|igshid|ref_src)=.*"),
        s"[$i] tracking param survived: $u -> $once")
      assert(host === host.toLowerCase, s"[$i] host not lowercased: $once")
      assert(dom === refDomain(host), s"[$i] domain mismatch for $host")
      assert(byI(i) === u, "row mixup")
    }
  }
}
