package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{robots_allowed, robots_rules}

/** RFC 9309 robots exclusion ([[graft.plans.RobotsRules]] /
  * [[graft.plans.RobotsDecision]]): pinned cases for every parser and
  * precedence rule the RFC defines, seeded fuzz against an INDEPENDENT
  * reference (state-machine parser + backtracking matcher — no regex, no
  * shared code), and the broadcast frontier gate end to end.
  */
class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private val seed =
    sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  // ---- independent reference: explicit state-machine parser ----
  private def refToken(v: String): String = {
    val t = v.trim
    if (t.startsWith("*")) "*"
    else t.takeWhile(c => c < 128 && (c.isLetterOrDigit || c == '-' || c == '_'))
      .toLowerCase
  }

  private def refRules(text: String, agent: String): Seq[(Boolean, String)] = {
    final case class Group(uas: List[String], rules: List[(Boolean, String)])
    var done = List.empty[Group]
    var cur: Option[Group] = None
    var inUaRun = false
    for (raw <- text.split("\r\n|\n|\r", -1)) {
      val line = (raw.split("#", 2)(0)).trim
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val k = line.substring(0, colon).trim.toLowerCase
        val v = line.substring(colon + 1).trim
        k match {
          case "user-agent" =>
            if (!inUaRun) { cur.foreach(g => done :+= g); cur = Some(Group(Nil, Nil)) }
            cur = cur.map(g => g.copy(uas = g.uas :+ refToken(v)))
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            if (cur.isDefined && v.nonEmpty)
              cur = cur.map(g => g.copy(rules = g.rules :+ ((k == "allow", v))))
          case _ => inUaRun = false
        }
      }
    }
    cur.foreach(g => done :+= g)
    val exact = done.filter(_.uas.contains(refToken(agent)))
    (if (exact.nonEmpty) exact else done.filter(_.uas.contains("*")))
      .flatMap(_.rules)
  }

  // ---- independent reference: backtracking matcher, no regex ----
  private def refMatch(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    def go(pi: Int, si: Int): Boolean =
      if (pi == body.length) !anchored || si == path.length
      else if (body(pi) == '*') (si to path.length).exists(go(pi + 1, _))
      else si < path.length && path(si) == body(pi) && go(pi + 1, si + 1)
    go(0, 0)
  }

  private def refAllowed(path: String, rules: Seq[(Boolean, String)]): Boolean = {
    val hits = rules.filter { case (_, p) => refMatch(path, p) }
    if (hits.isEmpty) true
    else {
      val best = hits.map(_._2.length).max
      hits.filter(_._2.length == best).exists(_._1) // tie -> allow wins
    }
  }

  private def sparkRules(text: String, agent: String): Seq[(Boolean, String)] =
    Seq(text).toDF("t").select(robots_rules(col("t"), agent).as("r"))
      .select(explode(col("r")).as("x")).select("x.allow", "x.pattern")
      .as[(Boolean, String)].collect().toSeq

  private def sparkAllowed(
      path: String, text: String, agent: String): Boolean =
    Seq((path, text)).toDF("p", "t")
      .select(robots_allowed(col("p"), robots_rules(col("t"), agent)))
      .as[Boolean].head()

  private val RfcFile =
    """# robots.txt for example.com
      |User-agent: graftbot
      |User-agent: mirrorbot
      |Disallow: /private/
      |Allow: /private/public$
      |Crawl-delay: 5
      |
      |User-agent: *
      |Disallow: /tmp/*
      |Disallow: /*.gif$
      |Allow:
      |
      |User-agent: graftbot
      |Disallow: /drafts
      |""".stripMargin

  test("parser: groups, merge of duplicate-token groups, comments, unknown directives, empty values") {
    // both groups naming graftbot MERGE (RFC §2.2.1); * group is ignored
    // for graftbot; the empty Allow carries no rule
    assert(sparkRules(RfcFile, "GraftBot") === Seq(
      (false, "/private/"), (true, "/private/public$"), (false, "/drafts")))
    assert(sparkRules(RfcFile, "unknownbot") === Seq(
      (false, "/tmp/*"), (false, "/*.gif$")))
    // CRLF + rules before any group are ignored + case-insensitive keys
    val messy = "Disallow: /orphan\r\nUSER-AGENT: a\r\nDISALLOW: /x\r\nuser-agent: b\nDisallow: /y"
    assert(sparkRules(messy, "a") === Seq((false, "/x")))
    // a UA line AFTER rules starts a NEW group (the second a-group's rule
    // set is /y only when reached via b? no — group(a) = /x, group(b) = /y)
    assert(sparkRules(messy, "b") === Seq((false, "/y")))
    assert(sparkRules(messy, "zzz").isEmpty, "no group, no * group -> no rules")
    // product-token extraction (RFC §2.2.1): a version/comment tail on the
    // UA line must not defeat the bare-token match
    val versioned =
      "User-agent: GraftBot/1.0 (+https://example.com/bot)\nDisallow: /v\n" +
        "User-agent: *\nAllow: /"
    assert(sparkRules(versioned, "graftbot") === Seq((false, "/v")))
    assert(sparkRules(versioned, "graftbot/9.9") === Seq((false, "/v")),
      "the crawler-side agent string is tokenized too")
  }

  test("decision: longest match, allow tie-break, $ anchor, * wildcard, no-match allowed") {
    assert(!sparkAllowed("/private/page", RfcFile, "graftbot"))
    assert(sparkAllowed("/private/public", RfcFile, "graftbot"))
    assert(!sparkAllowed("/private/public2", RfcFile, "graftbot"), "$ must anchor")
    assert(sparkAllowed("/open/page", RfcFile, "graftbot"))
    assert(!sparkAllowed("/tmp/a/b", RfcFile, "otherbot"))
    assert(!sparkAllowed("/img/x.gif", RfcFile, "otherbot"))
    assert(sparkAllowed("/img/x.gift", RfcFile, "otherbot"), "$ must anchor")
    assert(sparkAllowed("/anything", "User-agent: *\nAllow: /", "bot"))
    // equal-length tie goes to allow
    assert(sparkAllowed("/a/b",
      "User-agent: *\nDisallow: /a/b\nAllow: /a/b", "bot"))
    // no rules at all -> allowed
    assert(sparkAllowed("/x", "", "bot"))
  }

  test(s"fuzz: parse + decide == independent reference over 600 robots files [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed ^ 0x0b07L)
    val uaPool = Seq("graftbot", "GraftBot", "otherbot", "*", "MirrorBot",
      "graftbot/1.0", "MirrorBot/2.1 (+http://e.com/bot)", "Other-Bot_2")
    val patPool = Seq("/", "/a", "/a/", "/a/b", "/*.gif$", "/tmp/*", "/a*b",
      "/a/b$", "/*/c", "/a**b", "/$", "/x.gif$", "/priv")
    val junk = Seq("Crawl-delay: 5", "Sitemap: https://e.com/s.xml",
      "# a comment", "", "   ", "nonsense without colon", "Noindex: /x")
    val paths = Seq("/", "/a", "/a/", "/a/b", "/a/b/c", "/tmp/q", "/x.gif",
      "/x.gift", "/ab", "/axb", "/a/c", "/priv/1", "")
    val nl = Seq("\n", "\r\n", "\r")
    for (i <- 0 until 600) {
      val lines = (0 until rnd.nextInt(14)).map { _ =>
        rnd.nextInt(10) match {
          case 0 | 1 | 2 => s"User-agent: ${uaPool(rnd.nextInt(uaPool.length))}"
          case 3 | 4 | 5 => s"Disallow: ${patPool(rnd.nextInt(patPool.length))}"
          case 6 | 7 => s"Allow: ${patPool(rnd.nextInt(patPool.length))}"
          case 8 => junk(rnd.nextInt(junk.length))
          case _ => if (rnd.nextBoolean()) "Disallow:" else "Allow:"
        }
      }
      val text = lines.mkString(nl(rnd.nextInt(nl.length)))
      val agent = Seq("graftbot", "otherbot", "nobot")(rnd.nextInt(3))
      val expect = refRules(text, agent)
      val got = sparkRules(text, agent)
      assert(got === expect, s"[$i] rules diverged for agent=$agent:\n$text")
      val path = paths(rnd.nextInt(paths.length))
      assert(sparkAllowed(path, text, agent) === refAllowed(path, expect),
        s"[$i] verdict diverged for $path under agent=$agent:\n$text")
    }
  }

  test("crawl-delay: group-scoped, exact beats *, merged groups take the max, junk ignored") {
    import graft.functions.{robots_crawl_delay, robots_sitemaps}
    def delay(text: String, agent: String): Option[Double] =
      Seq(text).toDF("t").select(robots_crawl_delay(col("t"), agent).as("d"))
        .as[Option[Double]].head()
    // RfcFile: graftbot's group carries Crawl-delay: 5; the * group none
    assert(delay(RfcFile, "graftbot") === Some(5.0))
    assert(delay(RfcFile, "unknownbot") === None,
      "the * group carries no delay; graftbot's must not leak")
    // exact group WITHOUT a delay beats a * group WITH one: the chosen
    // groups are the exact ones, so no delay governs
    val exactNoDelay =
      "User-agent: graftbot\nDisallow: /a\n\nUser-agent: *\nCrawl-delay: 9\nDisallow: /b"
    assert(delay(exactNoDelay, "graftbot") === None)
    assert(delay(exactNoDelay, "other") === Some(9.0))
    // merged duplicate-token groups: most restrictive (max) wins
    val merged =
      "User-agent: a\nCrawl-delay: 2\nDisallow: /x\n\nUser-agent: a\nCrawl-delay: 7.5"
    assert(delay(merged, "a") === Some(7.5))
    // junk values ignored; a crawl-delay line still ends a UA run (the
    // second User-agent starts a NEW group, same grouping as before)
    val junk =
      "User-agent: a\nCrawl-delay: soon\nCrawl-delay: -3\nCrawl-delay: 4 # sec\nUser-agent: b\nDisallow: /y"
    assert(delay(junk, "a") === Some(4.0))
    assert(sparkRules(junk, "b") === Seq((false, "/y")),
      "a crawl-delay line must end the UA run exactly like an ignored directive")
    assert(delay(junk, "b") === None)
    // sitemaps: standalone records, file order, independent of groups
    val sm = "Sitemap: https://e.com/a.xml\nUser-agent: a\nDisallow: /x\n" +
      "Sitemap: https://e.com/b.xml # main\nuser-agent: b\nSITEMAP: https://e.com/c.xml"
    val sms = Seq(sm).toDF("t").select(robots_sitemaps(col("t")).as("s"))
      .as[Seq[String]].head()
    assert(sms === Seq("https://e.com/a.xml", "https://e.com/b.xml", "https://e.com/c.xml"))
    // and the sitemap lines changed no rule/grouping semantics
    assert(sparkRules(sm, "a") === Seq((false, "/x")))
  }

  test("robotsQuotaTable: delays become per-domain window quotas, most restrictive host governs") {
    val robots = Seq(
      ("www.slow-site.com", "User-agent: *\nCrawl-delay: 2880\nDisallow: /tmp"),
      ("cdn.slow-site.com", "User-agent: *\nCrawl-delay: 8640"), // stricter host, same domain
      ("fast-site.org", "User-agent: *\nCrawl-delay: 864"),
      ("glacial.net", "User-agent: *\nCrawl-delay: 200000"),     // delay > window -> floor at 1
      ("silent.io", "User-agent: *\nDisallow: /private"))        // no delay -> absent
      .toDF("host", "robots_txt")
    val q = graft.pipeline.WebCuration.robotsQuotaTable(robots, "graftbot", "1 day")
      .as[(String, Long)].collect().toMap
    // 86400/2880 = 30 vs 86400/8640 = 10 -> min 10 for the shared domain
    assert(q === Map("slow-site.com" -> 10L, "fast-site.org" -> 100L, "glacial.net" -> 1L))
  }

  test("robotsGate: broadcast per-host gate over a frontier; missing robots allows") {
    val robots = Seq(
      ("a.example.com",
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok$\nDisallow: /*?sid="),
      ("A.Example.COM", // case-variant duplicate authority: must collapse
        "User-agent: *\nDisallow: /private/\nAllow: /private/ok$\nDisallow: /*?sid="),
      ("b.example.com", "User-agent: graftbot\nDisallow: /"))
      .toDF("host", "robots_txt")
    val frontier = Seq(
      (1L, "https://a.example.com/private/x"),   // excluded
      (2L, "https://a.example.com/private/ok"),  // allowed ($ rule, longer)
      (3L, "https://A.EXAMPLE.com/pub/y"),       // allowed (host case-folds)
      (4L, "https://b.example.com/anything"),    // excluded (Disallow: /)
      (5L, "https://c.example.com/no/robots"),   // allowed (no robots row)
      (6L, "https://a.example.com"),             // empty path -> "/" allowed
      (7L, "https://a.example.com/x?sid=1"),     // excluded (query-string rule)
      (8L, "https://a.example.com/x?q=1#frag"))  // allowed (fragment outside match)
      .toDF("id", "url")
    val (ok, excluded) = graft.pipeline.WebCuration.robotsGate(
      frontier, col("url"), robots, agent = "graftbot")
    assert(ok.select("id").as[Long].collect().sorted.toSeq ===
      Seq(2L, 3L, 5L, 6L, 8L))
    assert(excluded.select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 4L, 7L))
    assert(ok.count() + excluded.count() === frontier.count(),
      "case-variant robots rows must not multiply frontier rows")
    assert(ok.columns.toSeq === frontier.columns.toSeq, "gate leaked temp columns")
    val plan = ok.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"robots side must broadcast, plan:\n$plan")
  }

  test("robotsGate is stream-safe: stream-static broadcast join, stream == batch across triggers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val robots = Seq(
      ("a.example.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok$"),
      ("b.example.com", "User-agent: graftbot\nDisallow: /"))
      .toDF("host", "robots_txt")
    val urls = (0 until 90).map { i =>
      val u = (i % 5) match {
        case 0 => s"https://a.example.com/private/$i"
        case 1 => "https://a.example.com/private/ok"
        case 2 => s"https://a.example.com/pub/$i"
        case 3 => s"https://b.example.com/x/$i"
        case _ => s"https://c.example.com/free/$i"
      }
      (i.toLong, u)
    }
    val expect = graft.pipeline.WebCuration.robotsGate(
        urls.toDF("id", "url"), col("url"), robots, "graftbot")
      ._1.select("id").as[Long].collect().toSet
    val in = MemoryStream[(Long, String)]
    val (okStream, _) = graft.pipeline.WebCuration.robotsGate(
      in.toDF().toDF("id", "url"), col("url"), robots, "graftbot")
    val q = okStream.writeStream.format("memory").queryName("robots_ok")
      .outputMode("append").start()
    var triggers = 0
    try {
      urls.grouped(30).foreach { c => in.addData(c); q.processAllAvailable(); triggers += 1 }
    } finally q.stop()
    assert(triggers >= 3)
    val got = spark.table("robots_ok").select("id").as[Long].collect().toSet
    assert(got === expect, s"stream gate diverged: ${(got diff expect) ++ (expect diff got)}")
    assert(expect.nonEmpty && expect.size < urls.size, "fixture must split")
  }
}
