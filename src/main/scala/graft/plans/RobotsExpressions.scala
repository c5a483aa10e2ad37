package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Robots Exclusion Protocol (RFC 9309, public spec; plus the Google
  * reference-parser conventions the RFC codified) as native expressions —
  * the crawl-front gate that sits BESIDE the PSL domain key: a polite
  * crawler fetches `/robots.txt` once per authority, then every frontier
  * URL must pass the parsed rule group before it is fetched.
  *
  * Two row-local expressions, both eval-bridged (the BpeSubwords posture):
  *   - [[RobotsRules]]: robots.txt TEXT → the `array<struct<allow,
  *     pattern>>` rule group governing one product token. Sequential
  *     line-scan per the RFC: groups are runs of `User-agent:` lines
  *     followed by rules; comments (`#`) and unknown directives are
  *     ignored (but an ignored directive still ends a user-agent run);
  *     matching is case-insensitive on directive names and product
  *     tokens; ALL groups naming the token merge (RFC §2.2.1); exact
  *     token match beats `*`; empty-valued Allow/Disallow carry no
  *     constraint and are dropped.
  *   - [[RobotsDecision]]: (path, rules) → allowed. RFC §2.2.2
  *     longest-match: `*` matches any octet run, a trailing `$` anchors
  *     the end; among matching rules the LONGEST pattern prevails, a
  *     length tie goes to allow, no match ⇒ allowed.
  *
  * 100 TB shape: robots documents live on the SMALL side (one per
  * authority — thousands of rows); parse there, broadcast the rule
  * arrays, and the per-URL decision is row-local with zero shuffle
  * ([[graft.pipeline.WebCuration.robotsGate]]). Pattern regexes are
  * memoized per (thread × expression) — a crawl evaluates the same few
  * patterns millions of times.
  */
private[plans] object RobotsParsing {

  val RuleType: StructType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false)))

  /** The PRODUCT TOKEN of a User-agent line value (RFC 9309 §2.2.1:
    * `1*(%x30-39 / %x41-5A / %x5F / %x61-7A / "-")`): a robots line may
    * carry a version or comment tail (`graftbot/1.0 (+http://…)`) that the
    * crawler's bare token must still match — comparison happens on the
    * token alone, lowercased. `*` stays `*`.
    */
  def productToken(value: String): String = {
    val v = value.trim
    if (v.startsWith("*")) "*"
    else v.takeWhile(c =>
      (c >= '0' && c <= '9') || (c >= 'A' && c <= 'Z') ||
        (c >= 'a' && c <= 'z') || c == '_' || c == '-')
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** One parsed group: its product tokens, its (allow, pattern) rules in
    * file order, and its `Crawl-delay` values (the de-facto extension RFC
    * 9309 §2.2.4 leaves to "other records" — Bing/Yandex honor it; it is
    * group-scoped like Allow/Disallow).
    */
  final case class Group(
      uas: mutable.ArrayBuffer[String],
      rules: mutable.ArrayBuffer[(Boolean, String)],
      delays: mutable.ArrayBuffer[Double])

  /** Sequential line scan per the RFC: groups are runs of `User-agent:`
    * lines followed by records; comments stripped; an ignored directive
    * still ends a user-agent run. Returns (groups, sitemaps) — `Sitemap`
    * is a STANDALONE record per the sitemaps.org extension (not scoped to
    * any group), collected file-wide. Grouping behavior is byte-identical
    * to the pre-refactor rulesFor: crawl-delay and sitemap lines fell
    * into the ignored-directive arm before, and both still end a UA run.
    */
  def parseGroups(text: String): (Seq[Group], Seq[String]) = {
    val groups = mutable.ArrayBuffer.empty[Group]
    val sitemaps = mutable.ArrayBuffer.empty[String]
    var collectingUas = false
    text.split("\r\n|\n|\r", -1).foreach { raw =>
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case i => raw.substring(0, i).trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!collectingUas || groups.isEmpty) {
                groups += Group(mutable.ArrayBuffer.empty,
                  mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)
                collectingUas = true
              }
              groups.last.uas += productToken(value)
            case "allow" | "disallow" =>
              collectingUas = false
              // rules before any user-agent line have no governing group
              // (RFC: rules outside a group are ignored); empty values
              // carry no constraint
              if (groups.nonEmpty && value.nonEmpty)
                groups.last.rules += ((key == "allow", value))
            case "crawl-delay" =>
              collectingUas = false
              // group-scoped; unparseable / non-positive / non-finite
              // values carry no constraint (the lenient-reader posture —
              // a bad delay must not stall a crawler to its default)
              if (groups.nonEmpty && value.nonEmpty)
                try {
                  val d = value.toDouble
                  if (d > 0 && java.lang.Double.isFinite(d)) groups.last.delays += d
                } catch { case _: NumberFormatException => () }
            case "sitemap" =>
              collectingUas = false
              if (value.nonEmpty) sitemaps += value
            case _ =>
              collectingUas = false // an ignored directive still ends a UA run
          }
        }
      }
    }
    (groups.toSeq, sitemaps.toSeq)
  }

  /** The groups governing `agent` (lowercase product token): ALL groups
    * naming the exact token merge (RFC §2.2.1); exact beats `*`.
    */
  private def groupsFor(text: String, agent: String): Seq[Group] = {
    val (groups, _) = parseGroups(text)
    val exact = groups.filter(_.uas.contains(agent))
    if (exact.nonEmpty) exact else groups.filter(_.uas.contains("*"))
  }

  /** Parse and select the rule group for `agent` (lowercase product
    * token). Returns (allow, pattern) pairs in file order.
    */
  def rulesFor(text: String, agent: String): Seq[(Boolean, String)] =
    groupsFor(text, agent).flatMap(_.rules.toSeq)

  /** The crawl delay governing `agent`, in seconds: the MAXIMUM (most
    * restrictive — the polite reading) across the chosen groups' valid
    * `Crawl-delay` values. None when no governing group carries one.
    */
  def crawlDelayFor(text: String, agent: String): Option[Double] = {
    val ds = groupsFor(text, agent).flatMap(_.delays.toSeq)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** All `Sitemap:` URLs in the file, file order (standalone records —
    * sitemaps.org extension; not scoped to any user-agent group).
    */
  def sitemapsOf(text: String): Seq[String] = parseGroups(text)._2

  /** RFC §2.2.2 path match: `*` = any octet run, trailing `$` = end
    * anchor, otherwise prefix semantics. `cache` memoizes compiled
    * patterns (bounded — robots files are small and repeat).
    */
  def pathMatches(
      path: String, pattern: String,
      cache: mutable.HashMap[String, java.util.regex.Pattern]): Boolean = {
    val p = cache.getOrElseUpdate(pattern, {
      if (cache.size > 4096) cache.clear()
      val anchored = pattern.endsWith("$")
      val body = if (anchored) pattern.dropRight(1) else pattern
      val rx = body.split("\\*", -1)
        .map(java.util.regex.Pattern.quote)
        .mkString("(?s)", ".*", if (anchored) "$" else "")
      java.util.regex.Pattern.compile(rx)
    })
    val m = p.matcher(path)
    if (pattern.endsWith("$")) m.matches() else m.lookingAt()
  }

  /** Longest-match decision: longest matching pattern prevails, length
    * tie → allow, no match → allowed.
    */
  def allowed(
      path: String, rules: Iterable[(Boolean, String)],
      cache: mutable.HashMap[String, java.util.regex.Pattern]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (allow, pattern) =>
      if (pathMatches(path, pattern, cache)) {
        val len = pattern.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len
          bestAllow = allow
        }
      }
    }
    if (bestLen < 0) true else bestAllow
  }
}

/** robots.txt text → the rule group for `agent` as
  * `array<struct<allow boolean, pattern string>>` (see [[RobotsParsing]]).
  */
case class RobotsRules(child: Expression, agent: String)
    extends UnaryExpression {

  private val agentLower = RobotsParsing.productToken(agent)

  override def dataType: DataType = ArrayType(RobotsParsing.RuleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"robots_rules expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val rules = RobotsParsing.rulesFor(
      input.asInstanceOf[UTF8String].toString, agentLower)
    new GenericArrayData(rules.map { case (allow, pattern) =>
      InternalRow(allow, UTF8String.fromString(pattern))
    }.toArray[Any])
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsRules", this, classOf[RobotsRules].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "robots_rules"
  override protected def withNewChildInternal(c: Expression): RobotsRules = copy(child = c)
}

/** (path, rules) → allowed under RFC 9309 longest-match precedence. */
case class RobotsDecision(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
        if s.length == 2 && s(0).dataType == BooleanType &&
          s(1).dataType == StringType => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"robots_allowed expects (string, array<struct<allow,pattern>>), got ($l, $r)")
    }

  @transient private lazy val cache =
    new ThreadLocal[mutable.HashMap[String, java.util.regex.Pattern]] {
      override def initialValue() = mutable.HashMap.empty
    }

  override def nullSafeEval(pathAny: Any, rulesAny: Any): Any = {
    val path = pathAny.asInstanceOf[UTF8String].toString
    val arr = rulesAny.asInstanceOf[ArrayData]
    val rules = (0 until arr.numElements()).map { i =>
      val row = arr.getStruct(i, 2)
      (row.getBoolean(0), row.getUTF8String(1).toString)
    }
    RobotsParsing.allowed(path, rules, cache.get())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsDecision", this, classOf[RobotsDecision].getName)
    nullSafeCodeGen(ctx, ev, (p, r) =>
      s"${ev.value} = (Boolean) $ref.nullSafeEval($p, $r);")
  }

  override def prettyName: String = "robots_allowed"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsDecision =
    copy(left = newLeft, right = newRight)
}

/** robots.txt text → the `Crawl-delay` (seconds, double) governing `agent`,
  * null when no governing group carries one. The de-facto extension that
  * actually sets per-domain fetch rates in production crawlers (RFC 9309
  * leaves it to §2.2.4 "other records"; Bing/Yandex honor it) — the value
  * [[graft.pipeline.WebCuration.politenessRouteRobots]] turns into a
  * per-domain shaping quota. Group selection and merge follow
  * [[RobotsRules]] exactly; the most RESTRICTIVE (maximum) delay of the
  * merged groups wins.
  */
case class RobotsCrawlDelay(child: Expression, agent: String)
    extends UnaryExpression {

  private val agentLower = RobotsParsing.productToken(agent)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"robots_crawl_delay expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    RobotsParsing.crawlDelayFor(input.asInstanceOf[UTF8String].toString, agentLower)
      .map(Double.box).orNull

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsDelay", this, classOf[RobotsCrawlDelay].getName)
    val obj = ctx.freshName("delayObj")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $obj = $ref.nullSafeEval($c);
         |if ($obj == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $obj; }
       """.stripMargin)
  }

  override def prettyName: String = "robots_crawl_delay"
  override protected def withNewChildInternal(c: Expression): RobotsCrawlDelay = copy(child = c)
}

/** robots.txt text → all `Sitemap:` URLs (standalone records, file order —
  * the sitemaps.org extension). The discovery feed a crawl frontier seeds
  * from beside the politeness rate.
  */
case class RobotsSitemaps(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"robots_sitemaps expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      RobotsParsing.sitemapsOf(input.asInstanceOf[UTF8String].toString)
        .map(UTF8String.fromString).toArray[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsSitemaps", this, classOf[RobotsSitemaps].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "robots_sitemaps"
  override protected def withNewChildInternal(c: Expression): RobotsSitemaps = copy(child = c)
}

/** sitemaps.org document parsing — the discovery feed behind the
  * `Sitemap:` URLs [[RobotsSitemaps]] surfaces. All three published
  * formats:
  *   - XML `<urlset>`: `<url><loc>…</loc></url>` entries are PAGE urls;
  *   - XML `<sitemapindex>`: `<sitemap><loc>…</loc></sitemap>` entries
  *     are CHILD sitemap urls (the recursion edge a frontier walks);
  *   - plain text: one page URL per line.
  * `<loc>` values are entity-unescaped (the five XML predefined entities
  * the spec requires escaping) and trimmed. Row-local linear-scan regex
  * (RE2-safe `[^<]` body — no nested quantifiers), stream-safe.
  */
private[plans] object SitemapParsing {
  private val LocRe = java.util.regex.Pattern.compile("(?is)<loc>\\s*([^<]+?)\\s*</loc>")
  private val UrlBlockRe = java.util.regex.Pattern.compile("(?is)<url\\b[^>]*>(.*?)</url\\s*>")
  private val LastmodRe = java.util.regex.Pattern.compile("(?is)<lastmod>\\s*([^<]+?)\\s*</lastmod>")
  private val ChangefreqRe = java.util.regex.Pattern.compile("(?is)<changefreq>\\s*([^<]+?)\\s*</changefreq>")
  private val PriorityRe = java.util.regex.Pattern.compile("(?is)<priority>\\s*([^<]+?)\\s*</priority>")

  private def unescape(s: String): String =
    // &amp; LAST — same one-shot rule as extract_text
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'").replace("&amp;", "&")

  /** (page urls, child sitemap urls) of one sitemap document. */
  def parse(doc: String): (Seq[String], Seq[String]) = {
    val lower = doc.toLowerCase(java.util.Locale.ROOT)
    val isIndex = lower.contains("<sitemapindex")
    val isUrlset = lower.contains("<urlset")
    if (isIndex || isUrlset) {
      val m = LocRe.matcher(doc)
      val urls = Seq.newBuilder[String]
      while (m.find()) urls += unescape(m.group(1))
      val all = urls.result()
      if (isIndex) (Nil, all) else (all, Nil)
    } else {
      // plain-text sitemap: one URL per line
      (doc.linesIterator.map(_.trim)
        .filter(l => l.startsWith("http://") || l.startsWith("https://")).toSeq, Nil)
    }
  }

  /** One `<urlset>` entry with its optional recrawl metadata. `lastmod`
    * stays the RAW W3C datetime string (timestamp semantics belong to the
    * engine's `to_date`/`to_timestamp`, not a second parser here);
    * `changefreq` is lowercased to the published vocabulary; `priority`
    * parses to its 0.0–1.0 range or null.
    */
  final case class Entry(
      loc: String, lastmod: String, changefreq: String, priority: java.lang.Double)

  /** Entries with metadata: `<urlset>` docs yield one entry per `<url>`
    * block that carries a `<loc>`; plain-text sitemaps yield loc-only
    * entries; a `<sitemapindex>` yields none (its children are
    * [[SitemapChildren]]'s edge, not pages).
    */
  def entries(doc: String): Seq[Entry] = {
    val lower = doc.toLowerCase(java.util.Locale.ROOT)
    if (lower.contains("<sitemapindex")) Nil
    else if (lower.contains("<urlset")) {
      val out = Seq.newBuilder[Entry]
      val bm = UrlBlockRe.matcher(doc)
      while (bm.find()) {
        val block = bm.group(1)
        val lm = LocRe.matcher(block)
        if (lm.find()) {
          def first(p: java.util.regex.Pattern): String = {
            val m = p.matcher(block)
            if (m.find()) m.group(1) else null
          }
          val freq = Option(first(ChangefreqRe))
            .map(_.trim.toLowerCase(java.util.Locale.ROOT)).orNull
          val prio = Option(first(PriorityRe)).flatMap(s =>
            scala.util.Try(s.trim.toDouble).toOption.filter(p => p >= 0.0 && p <= 1.0))
            .map(Double.box).orNull
          out += Entry(unescape(lm.group(1)), first(LastmodRe), freq, prio)
        }
      }
      out.result()
    } else parse(doc)._1.map(Entry(_, null, null, null))
  }
}

/** sitemap document → its PAGE urls (`<urlset>` entries or plain-text
  * lines; empty for a `<sitemapindex>`).
  */
case class SitemapUrls(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"sitemap_urls expects string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SitemapParsing.parse(input.asInstanceOf[UTF8String].toString)._1
        .map(UTF8String.fromString).toArray[Any])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sitemapUrls", this, classOf[SitemapUrls].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }
  override def prettyName: String = "sitemap_urls"
  override protected def withNewChildInternal(c: Expression): SitemapUrls = copy(child = c)
}

/** sitemap document → its CHILD sitemap urls (`<sitemapindex>` entries;
  * empty for a `<urlset>` or plain-text sitemap) — the recursion edge of
  * sitemap discovery.
  */
case class SitemapChildren(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"sitemap_children expects string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SitemapParsing.parse(input.asInstanceOf[UTF8String].toString)._2
        .map(UTF8String.fromString).toArray[Any])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sitemapChildren", this, classOf[SitemapChildren].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }
  override def prettyName: String = "sitemap_children"
  override protected def withNewChildInternal(c: Expression): SitemapChildren = copy(child = c)
}

/** sitemap document → entries WITH recrawl metadata:
  * `array<struct<loc, lastmod, changefreq, priority>>` per
  * [[SitemapParsing.entries]]. The metadata half of sitemap discovery the
  * loc-only [[SitemapUrls]] drops — lastmod/changefreq/priority decide
  * WHEN to revisit ([[graft.pipeline.WebCuration.recrawlPriority]]), not
  * just what to fetch.
  */
case class SitemapEntries(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("loc", StringType, nullable = false),
    StructField("lastmod", StringType, nullable = true),
    StructField("changefreq", StringType, nullable = true),
    StructField("priority", DoubleType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"sitemap_entries expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      SitemapParsing.entries(input.asInstanceOf[UTF8String].toString).map { e =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(e.loc),
          if (e.lastmod == null) null else UTF8String.fromString(e.lastmod),
          if (e.changefreq == null) null else UTF8String.fromString(e.changefreq),
          e.priority)
      }.toArray[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sitemapEntries", this, classOf[SitemapEntries].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "sitemap_entries"
  override protected def withNewChildInternal(c: Expression): SitemapEntries = copy(child = c)
}
