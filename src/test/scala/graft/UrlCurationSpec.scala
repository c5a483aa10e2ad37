package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.UrlFunctions._
import graft.pipeline.WebCuration

/** URL canonicalization + crawl-front curation (pq83 family). Pins the
  * canonicalize chain case by case, the PSL-subset registrable-domain
  * logic, and the dedup → blocklist → cap composition.
  */
class UrlCurationSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(url_canonicalize(col("u"))).as[String].head()

  test("url_canonicalize: each chain step, pinned") {
    // fragment + lowercase authority + default https port + www
    assert(canon("HTTPS://WWW.Example.COM:443/Path/Sub#frag") ===
      "https://example.com/Path/Sub")
    // path case preserved, http default port
    assert(canon("http://Host.Example.com:80/CaseKept") ===
      "http://host.example.com/CaseKept")
    // non-default port survives
    assert(canon("https://example.com:8443/a") === "https://example.com:8443/a")
    // tracking params: leading, middle, trailing, adjacent
    assert(canon("https://e.com/p?utm_source=x") === "https://e.com/p")
    assert(canon("https://e.com/p?utm_source=x&id=1") === "https://e.com/p?id=1")
    assert(canon("https://e.com/p?id=1&fbclid=z") === "https://e.com/p?id=1")
    assert(canon("https://e.com/p?utm_a=1&utm_b=2&id=3") === "https://e.com/p?id=3")
    assert(canon("https://e.com/p?a=1&gclid=g&b=2") === "https://e.com/p?a=1&b=2")
    // trailing slash, incl. root and slash-before-query
    assert(canon("https://e.com/a/b/") === "https://e.com/a/b")
    assert(canon("https://e.com/") === "https://e.com")
    assert(canon("https://e.com/a/?id=1") === "https://e.com/a?id=1")
    // no scheme: authority steps are no-ops, cleanup still applies
    assert(canon("example.com/a/#f") === "example.com/a")
    // www only stripped as a host prefix, not mid-host
    assert(canon("https://notwww.example.com/x") === "https://notwww.example.com/x")
    // percent normalization: unreserved decode, hex-case fold, reserved and
    // invalid triplets untouched (RFC 3986 §6.2.2)
    assert(canon("https://e.com/a%7eb%3ac") === "https://e.com/a~b%3Ac")
    assert(canon("https://e.com/%41%2f%") === "https://e.com/A%2F%")
    assert(canon("https://e.com/100%25?q=%7E") === "https://e.com/100%25?q=~")
    // IDN host fold: Unicode host -> punycode; ACE form is already canonical
    assert(canon("https://MÜNCHEN.example/x") === "https://xn--mnchen-3ya.example/x")
    assert(canon("https://xn--mnchen-3ya.example/x") ===
      "https://xn--mnchen-3ya.example/x")
    // non-ASCII ONLY outside the host: host untouched, percent steps apply
    assert(canon("https://e.com/ü%7e") === "https://e.com/ü~")
  }

  test("url_host / url_registrable_domain / url_depth") {
    val rows = Seq(
      "https://a.b.Example.CO.UK/x/y/z?q=1",
      "http://user:pw@deep.sub.example.com:8080/one",
      "https://example.com/",
      "https://spam.tracker.biz/offer/3/")
      .toDF("u")
      .select(
        url_host(col("u")).as("h"),
        url_domain(col("u")).as("d"),
        url_depth(col("u")).as("n"))
      .collect()
    assert(rows(0) === Row("a.b.example.co.uk", "example.co.uk", 3))
    assert(rows(1) === Row("deep.sub.example.com", "example.com", 1))
    assert(rows(2) === Row("example.com", "example.com", 0))
    assert(rows(3) === Row("spam.tracker.biz", "tracker.biz", 2))
  }

  test("url_registrable_domain: <=2 labels pass through; custom suffixes") {
    val d = Seq("example.com", "localhost", "co.uk").toDF("h")
      .select(url_registrable_domain(col("h")).as("d")).as[String].collect()
    assert(d === Seq("example.com", "localhost", "co.uk"))
    val custom = Seq("a.b.example.dev.local").toDF("h")
      .select(url_registrable_domain(col("h"), Seq("dev.local")).as("d"))
      .as[String].head()
    assert(custom === "example.dev.local")
  }

  test("withRegistrableDomain (broadcast PSL) == the pinned-subset column form") {
    val rnd = new scala.util.Random(20260816L)
    val tails = graft.functions.UrlFunctions.MultiLabelSuffixes ++ Seq("com", "org", "io", "dev")
    val hosts = (0 until 400).map { _ =>
      val depth = 1 + rnd.nextInt(3)
      (0 until depth).map(_ => s"l${rnd.nextInt(20)}").mkString(".") +
        "." + tails(rnd.nextInt(tails.size))
    } ++ Seq("localhost", "co.uk", "example.com")
    val psl = graft.functions.UrlFunctions.MultiLabelSuffixes.toDF("suffix")
      // a big PSL must stay a broadcast join, not an isin literal: pad it
      .unionByName((0 until 5000).map(i => s"fake$i.zz").toDF("suffix"))
    val out = WebCuration.withRegistrableDomain(
        hosts.toDF("h"), col("h"), psl, "d")
      .withColumn("expect", url_registrable_domain(col("h")))
      .filter(!(col("d") <=> col("expect")))
      .collect()
    assert(out.isEmpty, s"PSL form diverges on ${out.take(3).mkString(", ")}")
  }

  test("canonicalUrlDedup elects min id per canonical form") {
    val df = Seq(
      (1L, "https://E.com/a?utm_source=x"),
      (2L, "https://e.com/a/"),          // same canonical as 1
      (3L, "https://e.com/b"))
      .toDF("id", "url")
    val out = WebCuration.canonicalUrlDedup(df, col("id"), col("url"))
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L), (3L, 1L)))
  }

  test("curateCrawl: dedup -> blocklist -> cap, end to end") {
    val docs = Seq(
      (1L, "https://keep.example.com/a", 0.9),
      (2L, "https://keep.example.com/a/", 0.8),  // dup of 1, dropped
      (3L, "https://keep.example.com/b", 0.7),
      (4L, "https://keep.example.com/c", 0.6),   // over cap=2, dropped
      (5L, "https://bad.tracker.biz/x", 0.99))   // blocklisted
      .toDF("id", "url", "score")
    val blocked = Seq("tracker.biz").toDF("domain")
    val out = WebCuration.curateCrawl(
      docs, col("id"), col("url"), col("score"), blocked, cap = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 3L))
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 2))
    assert(out.forall(_.getAs[Long]("n_total") === 3L)) // 1,3,4 post-dedup
    assert(out.head.getAs[String]("canon_url") === "https://keep.example.com/a")
    graft.pipeline.Curation.releaseStageCaches()
  }

  test("crawlToCorpus: every stage bites — dedup, blocklist, C4 page gate, Gopher gate, cap") {
    val prose = (1 to 4).map(i =>
      s"the quick brown fox number $i jumps over that lazy dog today.")
      .mkString("\n")
    val bullets = prose.split("\n").map("- " + _).mkString("\n")
    val docs = Seq(
      (1L, "https://Keep.example.com/a?utm_source=x", prose),  // kept
      (2L, "https://keep.example.com/a/", prose),              // URL dup of 1
      (3L, "https://keep.example.com/b", prose + "\nif (x) { return; }"), // C4 page gate
      (4L, "https://keep.example.com/c", bullets),             // Gopher bullet gate
      (5L, "https://keep.example.com/d", prose),               // kept
      (6L, "https://bad.tracker.biz/x", prose))                // blocklisted
      .toDF("id", "url", "body")
    val blocked = Seq("tracker.biz").toDF("domain")
    val out = WebCuration.crawlToCorpus(
      docs, col("id"), col("url"), col("body"), blocked, cap = 1,
      gopher = graft.quality.GopherRules.Params(
        minWords = 10L, minStopWords = 2L))
      .collect()
    // cap=1 on the 2 fully-gated survivors (1 and 5): exactly one row
    assert(out.length === 1)
    val r = out.head
    assert(Seq(1L, 5L).contains(r.getAs[Long]("doc_id")))
    assert(r.getAs[String]("domain") === "example.com")
    assert(r.getAs[Long]("n_total") === 2L)
    // C4 kept every prose line (all end in '.'), so the clean text is the body
    assert(r.getAs[String]("canon_url").startsWith("https://keep.example.com/"))
    graft.pipeline.Curation.releaseStageCaches()
  }

  test("crawlToCorpus with the full PSL splits a wildcard registry's cap the heuristic pools") {
    val prose = (1 to 4).map(i =>
      s"the quick brown fox number $i jumps over that lazy dog today.")
      .mkString("\n")
    // 12 docs across 3 *.kawasaki.jp sub-registries (4 each) + 2 under the
    // exception domain city.kawasaki.jp (blocked)
    val docs = ((0 until 12).map { i =>
      (i.toLong, s"https://reg${i % 3}.kawasaki.jp/d/$i", prose)
    } ++ Seq(
      (20L, "https://a.city.kawasaki.jp/x", prose),
      (21L, "https://b.city.kawasaki.jp/y", prose)))
      .toDF("id", "url", "body")
    val blocked = Seq("city.kawasaki.jp").toDF("domain")
    val gp = graft.quality.GopherRules.Params(minWords = 10L, minStopWords = 2L)
    // PSL form: each regK.kawasaki.jp is its own registrable domain -> cap 2
    // keeps 2 per sub-registry = 6 rows; the exception domain is blocked
    val pslOut = WebCuration.crawlToCorpus(
      docs, col("id"), col("url"), col("body"), blocked, cap = 2, gopher = gp,
      psl = Some(graft.pipeline.Psl.sample)).collect()
    assert(pslOut.length === 6, s"got ${pslOut.length}")
    assert(pslOut.map(_.getAs[String]("domain")).distinct.sorted.toSeq ===
      (0 until 3).map(k => s"reg$k.kawasaki.jp"))
    assert(pslOut.forall(_.getAs[Long]("n_total") === 4L))
    // heuristic form: ALL of them key as kawasaki.jp — one pooled cap of 2,
    // and the exception-rule block misses (city docs key as kawasaki.jp too)
    val heurOut = WebCuration.crawlToCorpus(
      docs, col("id"), col("url"), col("body"), blocked, cap = 2, gopher = gp)
      .collect()
    assert(heurOut.length === 2 &&
      heurOut.forall(_.getAs[String]("domain") === "kawasaki.jp"),
      "expected the heuristic to pool the registry (the documented gap)")
    assert(heurOut.forall(_.getAs[Long]("n_total") === 14L))
    graft.pipeline.Curation.releaseStageCaches()
  }

  test("dedupeUrlStream: first canonical form wins across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, String)]
    val src = in.toDF().toDF("id", "tsm", "url")
      .select(col("id"), timestamp_millis(col("tsm")).as("ts"), col("url"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = WebCuration.dedupeUrlStream(src, col("url"), "ts", "1 hour")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(r.getAs[Long]("id"))); ()
      }.start()
    val base = 1704067200000L
    in.addData((1L, base, "https://E.com/a?utm_source=x"),
      (2L, base + 1, "https://e.com/b"))
    q.processAllAvailable()
    // batch 2: re-crawl variants of both URLs + one new URL
    in.addData((3L, base + 2, "https://www.e.com/a/"),
      (4L, base + 3, "HTTP://e.com/b"),   // different scheme -> different canon
      (5L, base + 4, "https://e.com/b#frag"))
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(got.asScala.toSet === Set(1L, 2L, 4L),
      s"expected first-arrival winners, got ${got.asScala.toSet}")
  }

  test("crawlGateStream + perSourceCapStream == batch crawlToCorpus, across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def prose(tag: String) = (1 to 4).map(i =>
      s"the $tag fox number $i jumps over that lazy dog today.").mkString("\n")
    val base = 1704067200000L
    // ids ordered by batch so the streaming first-arrival dedup picks the
    // same survivor as the batch min-id election; canonical duplicates
    // never share a micro-batch (within-batch survivor order is undefined)
    val batch1 = Seq(
      (1L, "https://a.example.com/x?utm_source=f", prose("alpha")),
      (2L, "https://a.example.com/y", prose("beta")),
      (3L, "https://b.example.org/p", prose("gamma")),
      (4L, "https://bad.tracker.biz/z", prose("delta")),      // blocklisted
      (5L, "https://a.example.com/code", prose("eps") + "\nif (x) { return; }"))
    val batch2 = Seq(
      (6L, "https://www.a.example.com/x/", prose("other")),   // canon dup of 1
      (7L, "https://b.example.org/q", prose("zeta")),
      (8L, "https://a.example.com/bullets",
        prose("eta").split("\n").map("- " + _).mkString("\n")), // gopher bullet fail
      (9L, "https://a.example.com/w", prose("theta")))
    val blocked = Seq("tracker.biz").toDF("domain")
    val gp = graft.quality.GopherRules.Params(minWords = 10L, minStopWords = 2L)

    val in = MemoryStream[(Long, String, String)]
    val src = in.toDF().toDF("id", "url", "body")
      .select(timestamp_millis(lit(base) + col("id")).as("ts"),
        col("id"), col("url"), col("body"))
    val gated = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, String, String, Double, String)]()
    val q = WebCuration.crawlGateStream(
        src, col("id"), col("url"), col("body"), "ts", "1 hour",
        blocked, gopher = gp)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => gated.add((r.getLong(0), r.getString(1),
          r.getString(2), r.getDouble(3), r.getString(4))))
        ()
      }.start()
    in.addData(batch1.map { case (i, u, t) => (i, u, t) }); q.processAllAvailable()
    in.addData(batch2.map { case (i, u, t) => (i, u, t) }); q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val got = gated.asScala.toSet
    val all = (batch1 ++ batch2).toDF("id", "url", "body")
    val batchPreCap = WebCuration.crawlToCorpus(
        all, col("id"), col("url"), col("body"), blocked, cap = 100, gopher = gp)
      .select(col("doc_id"), col("canon_url"), col("domain"),
        col("score"), col("clean_hash"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getString(4))).toSet
    assert(got.nonEmpty && got === batchPreCap,
      s"stream gate diverged from batch (stream ${got.size}, batch ${batchPreCap.size})")

    // cap hop: the gated stream through perSourceCapStream; last emission
    // per domain = the batch cap
    val in2 = MemoryStream[(Long, String, Double)]
    val capped = new java.util.concurrent.ConcurrentHashMap[String, Seq[Long]]()
    val q2 = graft.streaming.StreamingCaps.perSourceCapStream(
        in2.toDF().toDF("id", "domain", "s"),
        col("id"), col("domain"), col("s"), cap = 2)
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r =>
          capped.put(r.getString(0), r.getSeq[Long](1)))
        ()
      }.start()
    in2.addData(got.toSeq.sortBy(_._1).map(t => (t._1, t._3, t._4)))
    q2.processAllAvailable(); q2.stop()
    val streamAdmitted = capped.values().asScala.flatten.toSet
    val batchAdmitted = WebCuration.crawlToCorpus(
        all, col("id"), col("url"), col("body"), blocked, cap = 2, gopher = gp)
      .select("doc_id").as[Long].collect().toSet
    assert(streamAdmitted === batchAdmitted,
      s"cap hop diverged: stream $streamAdmitted vs batch $batchAdmitted")
    graft.pipeline.Curation.releaseStageCaches()
  }

  test("frontierDiff: URL-form churn reads unchanged; duplicates collapse deterministically") {
    val v1 = Seq(
      ("https://e.com/a?utm_source=x", "alpha"),
      ("https://e.com/a/", "alpha"),          // intra-snapshot dup of the same canon
      ("https://e.com/b", "beta"),
      ("https://e.com/gone", "bye"))
      .toDF("url", "text")
    val v2 = Seq(
      ("https://www.e.com/a", "alpha"),       // form churn only -> unchanged
      ("https://e.com/b#frag", "beta2"),      // content moved -> changed
      ("https://e.com/new", "hello"))         // -> added
      .toDF("url", "text")
    val got = WebCuration.frontierDiff(v1, v2, col("url"), col("text"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === Map(
      "https://e.com/a" -> "unchanged",
      "https://e.com/b" -> "changed",
      "https://e.com/gone" -> "removed",
      "https://e.com/new" -> "added"))
  }

  test("politenessRoute: a hot domain is diverted, cold domains pass — both decision rules") {
    val base = 1704067200000L
    val rows =
      (0 until 40).map(i => (100L + i, base + i * 100L,
        s"https://hot.example.com/p$i")) ++
      (0 until 5).map(i => (200L + i, base + i * 100L,
        s"https://cold$i.example.org/x"))
    val df = rows.toDF("id", "tsm", "url")
      .select(col("id"), timestamp_millis(col("tsm")).as("ts"), col("url"))
    for (sketch <- Seq(true, false)) {
      val (polite, diverted) = WebCuration.politenessRoute(
        df, col("url"), col("ts"), "1 minute", maxPerWindow = 10L,
        sketch = sketch)
      val d = diverted.select("id").as[Long].collect().toSet
      val p = polite.select("id").as[Long].collect().toSet
      assert(d === (100L until 140L).toSet, s"sketch=$sketch diverted=$d")
      assert(p === (200L until 205L).toSet, s"sketch=$sketch polite=$p")
    }
  }

  test("crawlFunnel: null-canonical rows count in n_raw only; counters match the stage semantics") {
    // 2 dups of one URL + 1 blocked + 1 clean + 1 NULL url (an unparseable
    // frontier row): n_raw sees all 5, the URL tier sees 3 groups, the
    // blocklist drops 1, and the text tier scores the 2 pass2 keepers
    val body = (1 to 8).map { j =>
      val jw = ('a' + (j % 26)).toChar.toString * 3
      s"Sentence $jw of the document body reads quite fine today."
    }.mkString("\n")
    val rows = Seq(
      (1L, "https://a.example.com/x?utm_source=r", body),
      (2L, "https://a.example.com/x", body),            // canonical dup of 1
      (3L, "https://spam.tracker.biz/y", body),          // blocklisted
      (4L, "https://ok.example.org/z", body),
      (5L, null.asInstanceOf[String], body))             // unparseable
    val blocked = Seq("tracker.biz").toDF("domain")
    val out = WebCuration.crawlFunnel(
      rows.toDF("id", "url", "text"), col("id"), col("url"), col("text"),
      blocked).as[(Long, Long, Long, Long, Long)].head()
    assert(out == ((5L, 3L, 2L, 2L, 2L)),
      s"funnel counters (raw, unique, unblocked, c4, gopher) off: $out")
  }

  test("sitemapFrontierSeed: discovery = sitemap pages minus frontier; children recurse; ≡ frontierDiff 'added'") {
    import graft.pipeline.WebCuration
    val sitemaps = Seq(
      // urlset advertising 3 pages — one already known to the frontier
      // under a DIFFERENT surface form (www + tracking param: canonical
      // identity must dedupe it, not string equality)
      """<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc> https://ex.com/a </loc></url>
        |<url><loc>https://ex.com/new1?x=1&amp;y=2</loc></url>
        |<url><loc>https://ex.com/new2</loc></url>
        |</urlset>""".stripMargin,
      // index entry: a child sitemap, NOT a page
      """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<sitemap><loc>https://ex.com/sitemap-more.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin,
      // plain-text sitemap
      "https://ex.com/new3\nnot a url line\nhttps://ex.com/new2").map(Tuple1(_))
      .toDF("doc")
    val frontier = Seq("https://www.ex.com/a?utm_source=feed", "https://ex.com/old")
      .toDF("url")
    val (discovery, children) = WebCuration.sitemapFrontierSeed(
      sitemaps, col("doc"), frontier, col("url"))
    val found = discovery.as[String].collect().toSet
    assert(found == Set(
      "https://ex.com/new1?x=1&y=2", "https://ex.com/new2", "https://ex.com/new3"),
      s"discovery set off: $found")
    assert(children.as[String].collect().toSeq == Seq("https://ex.com/sitemap-more.xml"))
    // composition witness: frontierDiff(frontier, frontier ∪ discovery)
    // marks EXACTLY the discovery set as 'added'
    val union = frontier.select(col("url"))
      .unionByName(discovery.select(col("canon_url").as("url")))
    val added = WebCuration.frontierDiff(frontier, union, col("url"), lit("x"))
      .filter(col("status") === "added")
      .select("canon_url").as[String].collect().toSet
    assert(added == found, s"frontierDiff composition diverged: $added vs $found")
  }

  test("recrawlPriority orders revisits by staleness: changed > never-crawled tie > stale-by-freq > never") {
    import graft.functions.sitemap_entries
    val now = 1760000000L
    val day = 86400L
    // one sitemap advertising five urls with distinct metadata shapes
    val xml =
      """<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |<url><loc>https://ex.com/changed</loc><lastmod>2026-01-01</lastmod><changefreq>yearly</changefreq><priority>0.3</priority></url>
        |<url><loc>https://ex.com/fresh-daily</loc><changefreq>daily</changefreq></url>
        |<url><loc>https://ex.com/stale-daily</loc><changefreq>daily</changefreq><priority>0.8</priority></url>
        |<url><loc>https://ex.com/never-crawled</loc><priority>0.9</priority></url>
        |<url><loc>https://ex.com/archived</loc><changefreq>never</changefreq><priority>1.0</priority></url>
        |</urlset>""".stripMargin
    val entries = Seq(xml).toDF("doc")
      .select(explode(sitemap_entries(col("doc"))).as("e"))
      .select(col("e.loc").as("url"),
        unix_timestamp(to_date(col("e.lastmod"), "yyyy-MM-dd")).as("lastmod_sec"),
        col("e.changefreq").as("changefreq"), col("e.priority").as("priority"))
    // lastmod 2026-01-01 (epoch 1767225600) is AFTER every fetch below
    val state = Seq(
      ("https://ex.com/changed", now - 30 * day),
      ("https://ex.com/fresh-daily", now - day / 2), // half its interval old
      ("https://ex.com/stale-daily", now - 2 * day), // 2x its interval
      ("https://ex.com/archived", now - 300 * day)   // ancient but 'never'
    ).toDF("url", "last_fetch_sec")
    val got = graft.pipeline.WebCuration.recrawlPriority(entries, state, now)
      .orderBy(col("score").desc, col("canon_url"))
      .select("canon_url", "known_changed", "staleness", "score")
      .as[(String, Boolean, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(
      "https://ex.com/never-crawled", // 0.9 * 4.0 = 3.6
      "https://ex.com/stale-daily",   // 0.8 * 2.0 = 1.6
      "https://ex.com/changed",       // 0.3 * 4.0 = 1.2 — lastmod beats a yearly freq
      "https://ex.com/fresh-daily",   // 0.5 * 0.5 = 0.25
      "https://ex.com/archived"       // 1.0 * 0.0 = 0 — never accrues nothing
    ), s"got $got")
    val byUrl = got.map(g => g._1 -> g).toMap
    assert(byUrl("https://ex.com/changed")._2, "lastmod after fetch flags known_changed")
    assert(byUrl("https://ex.com/changed")._4 == 1.2)
    assert(byUrl("https://ex.com/stale-daily")._3 == 2.0 &&
      byUrl("https://ex.com/stale-daily")._4 == 1.6)
    assert(byUrl("https://ex.com/never-crawled")._3 == 4.0)
    assert(byUrl("https://ex.com/archived")._4 == 0.0)
    assert(byUrl("https://ex.com/fresh-daily")._4 == 0.25,
      "absent priority takes the sitemaps.org 0.5 default")
  }
}
