package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Link extraction + reference resolution — the edge half of a crawl: every
  * fetched page advertises its outlinks (`<a href>`), and the frontier,
  * the link graph, and host-rank prioritization are all built from them.
  * Three row-local expressions:
  *
  *   - [[ExtractLinks]]: `<a>` anchors of a page as
  *     `array<struct<href, anchor, rel>>` — raw href (entity-unescaped,
  *     as written), visible anchor text (tags stripped, whitespace
  *     collapsed — the `extract_text` rules), and the `rel` attribute
  *     (`nofollow` is a per-link crawl directive);
  *   - [[RobotsMetaDirectives]]: the page-level
  *     `<meta name="robots" content="noindex, nofollow">` directives
  *     (and `none` = both, per the published robots-meta vocabulary) —
  *     the in-page counterpart of robots.txt;
  *   - [[ResolveUrl]]: RFC 3986 §5 reference resolution (merge +
  *     remove_dot_segments) — relative hrefs against the page url.
  *
  * All three are row-local (zero shuffle, stream-safe);
  * [[graft.pipeline.WebCuration.linkGraph]] composes them with
  * `url_canonicalize` into the canonical edge list.
  */
object LinkParsing {

  private val AnchorRe = java.util.regex.Pattern.compile(
    "(?is)<a\\b([^>]*)>(.*?)</a\\s*>")
  private val HrefRe = java.util.regex.Pattern.compile(
    """(?is)\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""")
  private val RelRe = java.util.regex.Pattern.compile(
    """(?is)\brel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""")
  private val MetaRobotsRe = java.util.regex.Pattern.compile(
    """(?is)<meta\b[^>]*\bname\s*=\s*["']?\s*robots\s*["']?[^>]*>""")
  private val ContentRe = java.util.regex.Pattern.compile(
    """(?is)\bcontent\s*=\s*("([^"]*)"|'([^']*)'|([^\s>"']+))""")
  private val AnyTag = java.util.regex.Pattern.compile("<[^>]*>")
  private val Spaces = java.util.regex.Pattern.compile("\\s+")

  private def attrValue(m: java.util.regex.Matcher): String = {
    if (m.group(2) != null) m.group(2)
    else if (m.group(3) != null) m.group(3)
    else m.group(4)
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  final case class Link(href: String, anchor: String, rel: String)

  /** `<a href>` links of a page, document order. Anchors without an href
    * (fragment targets) are skipped; href/rel values are unescaped.
    */
  def links(html: String): Seq[Link] = {
    val out = Seq.newBuilder[Link]
    val m = AnchorRe.matcher(html)
    while (m.find()) {
      val attrs = m.group(1)
      val hm = HrefRe.matcher(attrs)
      if (hm.find()) {
        val rm = RelRe.matcher(attrs)
        val rel = if (rm.find()) unescape(attrValue(rm)).trim.toLowerCase(java.util.Locale.ROOT)
          else null
        val anchor = Spaces.matcher(
          unescape(AnyTag.matcher(m.group(2)).replaceAll(" ")))
          .replaceAll(" ").trim
        out += Link(unescape(attrValue(hm)).trim, anchor, rel)
      }
    }
    out.result()
  }

  /** Page-level robots-meta directives. Multiple robots metas union
    * (restrictive wins — a page that says noindex anywhere is noindex);
    * `none` means both per the published vocabulary.
    */
  def robotsMeta(html: String): (Boolean, Boolean) = {
    var noindex = false
    var nofollow = false
    val m = MetaRobotsRe.matcher(html)
    while (m.find()) {
      val cm = ContentRe.matcher(m.group(0))
      if (cm.find()) {
        attrValue(cm).toLowerCase(java.util.Locale.ROOT).split(",").map(_.trim).foreach {
          case "noindex" => noindex = true
          case "nofollow" => nofollow = true
          case "none" => noindex = true; nofollow = true
          case _ => ()
        }
      }
    }
    (noindex, nofollow)
  }

  // ---------------------------------------------- RFC 3986 §5 resolution

  private final case class Parts(scheme: String, authority: String, path: String, query: String)

  /** Split an absolute URI into (scheme, //authority, path, ?query);
    * fragment is dropped (a crawl never fetches fragments). Null when the
    * base carries no scheme (resolution needs an absolute base).
    */
  private def parts(uri: String): Parts = {
    val noFrag = { val h = uri.indexOf('#'); if (h >= 0) uri.substring(0, h) else uri }
    val c = noFrag.indexOf(':')
    if (c <= 0) return null
    val scheme = noFrag.substring(0, c)
    if (!scheme.forall(ch => ch.isLetterOrDigit || ch == '+' || ch == '-' || ch == '.') ||
      !scheme.head.isLetter) return null
    var rest = noFrag.substring(c + 1)
    val (auth, afterAuth) =
      if (rest.startsWith("//")) {
        val end = rest.indexWhere(ch => ch == '/' || ch == '?', 2) match {
          case -1 => rest.length
          case i => i
        }
        (rest.substring(0, end), rest.substring(end))
      } else ("", rest)
    rest = afterAuth
    val q = rest.indexOf('?')
    val (path, query) =
      if (q >= 0) (rest.substring(0, q), rest.substring(q)) else (rest, "")
    Parts(scheme, auth, path, query)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[plans] def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "/..") {
        in = "/"
        if (out.nonEmpty) out.remove(out.length - 1)
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val (seg, rest) = if (next < 0) (in, "") else (in.substring(0, next), in.substring(next))
        out += seg
        in = rest
      }
    }
    out.mkString
  }

  /** RFC 3986 §5.3 resolution of `ref` against absolute `base`. Null when
    * the base is not absolute or the ref is empty-of-meaning (a bare
    * fragment — same-document, nothing to fetch). Scheme-relative,
    * absolute-path, query-only and relative-path refs all resolve; the
    * result never carries a fragment.
    */
  def resolve(base: String, ref0: String): String = {
    if (base == null || ref0 == null) return null
    val b = parts(base)
    if (b == null) return null
    val ref = { val h = ref0.indexOf('#'); if (h >= 0) ref0.substring(0, h) else ref0 }
    if (ref.isEmpty) {
      return if (ref0.startsWith("#")) null // same-document: nothing to fetch
      else b.scheme + ":" + b.authority + b.path + b.query
    }
    val r = parts(ref)
    if (r != null) {
      // absolute ref with its own scheme
      return r.scheme + ":" + r.authority + removeDotSegments(r.path) + r.query
    }
    if (ref.startsWith("//")) {
      val rp = parts(b.scheme + ":" + ref)
      if (rp == null) return null
      return b.scheme + ":" + rp.authority + removeDotSegments(rp.path) + rp.query
    }
    if (ref.startsWith("?")) return b.scheme + ":" + b.authority + b.path + ref
    val (rPath, rQuery) = {
      val q = ref.indexOf('?')
      if (q >= 0) (ref.substring(0, q), ref.substring(q)) else (ref, "")
    }
    val merged =
      if (rPath.startsWith("/")) rPath
      else if (b.authority.nonEmpty && b.path.isEmpty) "/" + rPath
      else {
        val cut = b.path.lastIndexOf('/')
        (if (cut >= 0) b.path.substring(0, cut + 1) else "") + rPath
      }
    b.scheme + ":" + b.authority + removeDotSegments(merged) + rQuery
  }
}

/** `extract_links(html)` — `array<struct<href, anchor, rel>>` of the
  * page's `<a href>` anchors ([[LinkParsing.links]]).
  */
case class ExtractLinks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false),
    StructField("rel", StringType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"extract_links expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      LinkParsing.links(input.asInstanceOf[UTF8String].toString).map { l =>
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromString(l.href),
          UTF8String.fromString(l.anchor),
          if (l.rel == null) null else UTF8String.fromString(l.rel))
      }.toArray[Any])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractLinks", this, classOf[ExtractLinks].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "extract_links"
  override protected def withNewChildInternal(c: Expression): ExtractLinks = copy(child = c)
}

/** `robots_meta(html)` — `struct(noindex boolean, nofollow boolean)` from
  * the page's robots meta tags ([[LinkParsing.robotsMeta]]).
  */
case class RobotsMetaDirectives(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("noindex", BooleanType, nullable = false),
    StructField("nofollow", BooleanType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"robots_meta expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val (ni, nf) = LinkParsing.robotsMeta(input.asInstanceOf[UTF8String].toString)
    org.apache.spark.sql.catalyst.InternalRow(ni, nf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("robotsMeta", this, classOf[RobotsMetaDirectives].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "robots_meta"
  override protected def withNewChildInternal(c: Expression): RobotsMetaDirectives =
    copy(child = c)
}

/** `resolve_url(base, ref)` — RFC 3986 §5 reference resolution
  * ([[LinkParsing.resolve]]); null for non-absolute bases and
  * same-document fragments.
  */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"resolve_url expects (string, string), got ($l, $r)")
    }

  override def nullSafeEval(base: Any, ref: Any): Any = {
    val s = LinkParsing.resolve(
      base.asInstanceOf[UTF8String].toString, ref.asInstanceOf[UTF8String].toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("resolveUrl", this, classOf[ResolveUrl].getName)
    val obj = ctx.freshName("resolved")
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""Object $obj = $ref.nullSafeEval($b, $r);
         |if ($obj == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $obj; }
       """.stripMargin)
  }

  override def prettyName: String = "resolve_url"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveUrl =
    copy(left = l, right = r)
}
