package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.pipeline.{Psl, PslRule, WebCuration}

/** Full Public Suffix List semantics ([[Psl]]): the broadcast-join column
  * plan is proven equal to an independent imperative JVM reference of the
  * published algorithm (publicsuffix.org/list §Algorithm) on pinned cases
  * covering every rule class — wildcard, exception, 3/4/5-label suffixes —
  * and on seeded fuzz hosts; the parser is pinned against the file-format
  * rules (comments, whitespace, `!`, `*.`); and the politeness route keyed
  * on the PSL form splits a wildcard registry the last-2-label heuristic
  * pools.
  */
class PslSpec extends SparkTestBase {
  import spark.implicits._

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  /** Independent imperative reference of the PSL algorithm: enumerate the
    * matching rules by direct label comparison (`*` matches exactly one
    * label), exception prevails (public suffix = rule minus leftmost
    * label), else longest match, else the default rule `*`.
    */
  private def refDomain(host0: String, psl: Psl): String = {
    val host = host0.toLowerCase(java.util.Locale.ROOT)
    val hl = host.split("\\.", -1)
    def ruleMatches(r: PslRule): Boolean = {
      val rl = r.key.split("\\.", -1)
      rl.length <= hl.length &&
        rl.reverse.zip(hl.reverse).forall { case (rp, hp) => rp == "*" || rp == hp }
    }
    val matching = psl.rules.filter(ruleMatches)
    val ps = matching.find(_.kind == Psl.Exception) match {
      case Some(exc) => exc.nlabels - 1
      case None if matching.nonEmpty => matching.map(_.nlabels).max
      case None => 1
    }
    if (hl.length > ps) hl.takeRight(ps + 1).mkString(".") else host
  }

  private def sparkDomains(hosts: Seq[String], psl: Psl): Seq[(String, String)] =
    psl.withRegistrableDomain(
        hosts.zipWithIndex.map(_.swap).toDF("i", "h"), col("h"), "d")
      .orderBy("i").select("h", "d").as[(String, String)].collect().toSeq

  test("parser: file format — comments, whitespace tails, !, *., case, dedup") {
    val psl = Psl.parse(Seq(
      "// a comment line",
      "",
      "COM",
      "co.uk  // trailing junk after whitespace is ignored",
      "*.CK",
      "!www.ck",
      "co.uk",
      "*"))
    assert(psl.rules.toSet === Set(
      PslRule("com", Psl.Normal, 1),
      PslRule("co.uk", Psl.Normal, 2),
      PslRule("*.ck", Psl.Wildcard, 2),
      PslRule("www.ck", Psl.Exception, 2)))
    assert(psl.maxDepth === 2)
  }

  test("algorithm: pinned cases for every rule class == reference") {
    val psl = Psl.sample
    val cases = Seq(
      // plain registries
      "example.com" -> "example.com",
      "a.b.example.com" -> "example.com",
      "example.co.uk" -> "example.co.uk",
      "a.b.example.co.uk" -> "example.co.uk",
      // host == its public suffix: pass through whole
      "co.uk" -> "co.uk",
      "com" -> "com",
      // 3-label exact suffix (aichi.jp is a real PSL entry)
      "x.pref.aichi.jp" -> "pref.aichi.jp",
      "pref.aichi.jp" -> "pref.aichi.jp",
      // wildcard *.kawasaki.jp: each sub-registry is its own suffix
      "a.hot.kawasaki.jp" -> "a.hot.kawasaki.jp",
      "deep.a.hot.kawasaki.jp" -> "a.hot.kawasaki.jp",
      "hot.kawasaki.jp" -> "hot.kawasaki.jp", // == its public suffix
      // exception !city.kawasaki.jp: city.kawasaki.jp IS registrable
      "city.kawasaki.jp" -> "city.kawasaki.jp",
      "sub.city.kawasaki.jp" -> "city.kawasaki.jp",
      // the spec's own ck family
      "www.ck" -> "www.ck",
      "shop.www.ck" -> "www.ck",
      "foo.bar.ck" -> "foo.bar.ck",
      // 5-label exact + 4-label wildcard (private section)
      "b.s3.dualstack.ap-northeast-1.amazonaws.com" ->
        "b.s3.dualstack.ap-northeast-1.amazonaws.com",
      "a.b.s3.dualstack.ap-northeast-1.amazonaws.com" ->
        "b.s3.dualstack.ap-northeast-1.amazonaws.com",
      "vm.uswest.compute.amazonaws.com" -> "vm.uswest.compute.amazonaws.com",
      "x.vm.uswest.compute.amazonaws.com" -> "vm.uswest.compute.amazonaws.com",
      // unlisted TLD: implicit default rule *
      "example.zz" -> "example.zz",
      "a.example.zz" -> "example.zz",
      // case folding
      "A.B.Example.CO.UK" -> "example.co.uk")
    val got = sparkDomains(cases.map(_._1), psl)
    cases.zip(got).foreach { case ((h, want), (_, d)) =>
      assert(d === want, s"host $h: got $d, want $want")
      assert(d === refDomain(h, psl), s"host $h: plan ${d} != reference")
    }
  }

  test(s"algorithm: plan == reference over 3000 fuzz hosts [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    val labels = Array("a", "b", "city", "hot", "www", "example", "sub",
      "pref", "s3", "dualstack", "ap-northeast-1", "amazonaws", "compute",
      "k12", "ak", "cc", "x9", "")
    val tails = Array("com", "co.uk", "uk", "ck", "kawasaki.jp", "kobe.jp",
      "aichi.jp", "jp", "us", "ak.us", "amazonaws.com", "zz", "github.io",
      "compute.amazonaws.com")
    val hosts = (0 until 3000).map { _ =>
      val depth = rnd.nextInt(5)
      val pre = (0 until depth).map(_ => labels(rnd.nextInt(labels.length)))
      (pre :+ tails(rnd.nextInt(tails.length))).mkString(".")
    }
    val psl = Psl.sample
    val got = sparkDomains(hosts, psl)
    hosts.zip(got).foreach { case (h, (h2, d)) =>
      assert(h === h2, "row mixup")
      assert(d === refDomain(h, psl), s"host '$h': plan $d != reference ${refDomain(h, psl)}")
    }
  }

  test("suffix-only rule table degenerates to the pinned-subset heuristic") {
    val rnd = new Random(seed ^ 0x51L)
    val labels = Array("a", "news", "example", "shop", "x")
    val tails = Array("com", "co.uk", "com.au", "net", "co.jp", "org.uk")
    val hosts = (0 until 500).map { _ =>
      ((0 until rnd.nextInt(3)).map(_ => labels(rnd.nextInt(labels.length))) :+
        labels(rnd.nextInt(labels.length)) :+
        tails(rnd.nextInt(tails.length))).mkString(".")
    }
    val suffixTable = Psl.parse(graft.functions.UrlFunctions.MultiLabelSuffixes)
    val got = suffixTable.withRegistrableDomain(
        hosts.zipWithIndex.map(_.swap).toDF("i", "h"), col("h"), "d")
      .withColumn("heur",
        graft.functions.UrlFunctions.url_registrable_domain(col("h")))
      .filter(!(col("d") <=> col("heur")))
    assert(got.isEmpty,
      s"PSL-vs-heuristic divergence on suffix-only rules: ${got.collect().mkString}")
  }

  test("politenessRoutePsl splits a wildcard registry the heuristic pools") {
    // 120 URLs under city.kawasaki.jp (the exception rule: one registrable
    // domain) + 40 spread across distinct *.kawasaki.jp sub-registries
    // (wildcard rule: each host IS its own registrable domain). Only the
    // city domain crosses quota=50. The last-2 heuristic keys ALL 160 as
    // kawasaki.jp and diverts everything — the documented under-split.
    val urls =
      (0 until 120).map(i => (i.toLong, s"https://a$i.city.kawasaki.jp/p/$i")) ++
      (0 until 40).map(i => (200L + i, s"https://b$i.cold$i.kawasaki.jp/q/$i"))
    val batch = urls.toDF("id", "url")
      .withColumn("ts", timestamp_millis(lit(1700000000000L) + col("id")))
    val (polite, diverted) = WebCuration.politenessRoutePsl(
      batch, col("url"), col("ts"), "1 minute", maxPerWindow = 50,
      psl = Psl.sample, sketch = false)
    assert(diverted.count() === 120, "only the hot sub-registry is diverted")
    assert(polite.count() === 40, "cold sub-registries pass")
    assert(polite.columns.toSeq === batch.columns.toSeq, "enrichment cols leaked")
    // the heuristic form pools them: everything diverted
    val (p2, d2) = WebCuration.politenessRoute(
      batch, col("url"), col("ts"), "1 minute", maxPerWindow = 50,
      sketch = false)
    assert(p2.count() === 0 && d2.count() === 160,
      "expected the last-2-label form to pool the registry (the documented gap)")
  }
}
