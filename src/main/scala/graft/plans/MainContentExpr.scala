package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Main-content extraction — the boilerplate-removal tier BETWEEN raw
  * markup stripping ([[graft.functions.TextFunctions.extract_text]]) and
  * the quality gates: `extract_text` keeps nav bars, cookie banners and
  * footers, so Gopher/C4 metrics computed over its output are diluted by
  * text no author wrote. This expression implements the published
  * text-density + link-density block-scoring family (jusText, Kohlschütter
  * et al.'s Boilerpipe — both public algorithms):
  *
  *   1. drop comments, `script`/`style` blocks, and the whole `head`;
  *   2. segment the body into blocks at block-level tag boundaries
  *      (`p div h1-h6 li td blockquote nav footer …`);
  *   3. per block, measure visible-text length, LINK DENSITY (chars
  *      rendered inside `<a>` / all visible chars — navigation is link-
  *      dense, prose is not), and STOP-WORD fraction (jusText's
  *      stoplist signal; the engine reuses Gopher's published stop-word
  *      set so the two tiers share one vocabulary);
  *   4. a block is CONTENT when it is long enough (`minLen`), link-sparse
  *      (`<= maxLinkDensity`) and — when `minStopFrac > 0` — stopword-
  *      dense enough; everything else is boilerplate;
  *   5. context pass (jusText's near-good rule): a short-but-clean block
  *      sandwiched between two content blocks (a headline inside the
  *      article body) is promoted.
  *
  * Output: `struct(n_blocks int, n_content int, text_main string)` with
  * content blocks joined by `\n`, each whitespace-collapsed and entity-
  * decoded exactly like `extract_text` (same five entities, `&amp;`
  * last). Row-local, zero shuffle, stream-safe; null html yields the
  * honest empty document, never null.
  */
case class MainContentExpr(
    child: Expression,
    minLen: Int = 80,
    maxLinkDensity: Double = 0.33,
    minStopFrac: Double = 0.0,
    contextPass: Boolean = true)
    extends UnaryExpression {

  require(minLen >= 1, s"minLen=$minLen must be positive")
  require(maxLinkDensity >= 0 && maxLinkDensity <= 1, s"bad maxLinkDensity=$maxLinkDensity")
  require(minStopFrac >= 0 && minStopFrac <= 1, s"bad minStopFrac=$minStopFrac")

  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", IntegerType, nullable = false),
    StructField("n_content", IntegerType, nullable = false),
    StructField("text_main", StringType, nullable = false)))

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"main_content needs string, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any =
    evalNullable(child.eval(input).asInstanceOf[AnyRef])

  def evalNullable(v: AnyRef): Any =
    if (v == null) InternalRow(0, 0, UTF8String.EMPTY_UTF8)
    else compute(v.asInstanceOf[UTF8String].toString)

  private def compute(html: String): Any = {
    import MainContentExpr._
    val body = HeadBlocks.matcher(html).replaceAll(" ")
    val rawBlocks = BlockBoundary.split(body)
    // per non-empty block: (visible text, link-char count)
    val texts = new scala.collection.mutable.ArrayBuffer[String](rawBlocks.length)
    val linkDens = new scala.collection.mutable.ArrayBuffer[Double](rawBlocks.length)
    var bi = 0
    while (bi < rawBlocks.length) {
      val raw = rawBlocks(bi)
      if (raw.exists(c => !c.isWhitespace)) {
        // link chars: visible text inside <a>…</a> spans of this block
        var linkChars = 0
        val am = Anchor.matcher(raw)
        while (am.find()) linkChars += visible(am.group(1)).length
        val text = visible(raw)
        if (text.nonEmpty) {
          texts += text
          linkDens += (if (text.isEmpty) 0.0 else math.min(1.0, linkChars.toDouble / text.length))
        }
      }
      bi += 1
    }
    val n = texts.length
    val content = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      content(i) = texts(i).length >= minLen && linkDens(i) <= maxLinkDensity &&
        (minStopFrac <= 0.0 || stopFrac(texts(i)) >= minStopFrac)
      i += 1
    }
    if (contextPass) {
      // jusText's near-good promotion, strict two-sided form: only a block
      // whose IMMEDIATE neighbors are both content gets promoted, so
      // boilerplate at the page edges can never ride along
      val promoted = new Array[Boolean](n)
      i = 1
      while (i < n - 1) {
        promoted(i) = !content(i) && content(i - 1) && content(i + 1) &&
          texts(i).length >= math.max(1, minLen / 4) && linkDens(i) <= maxLinkDensity
        i += 1
      }
      i = 0
      while (i < n) { content(i) = content(i) || promoted(i); i += 1 }
    }
    val sb = new java.lang.StringBuilder
    var kept = 0
    i = 0
    while (i < n) {
      if (content(i)) {
        if (kept > 0) sb.append('\n')
        sb.append(texts(i))
        kept += 1
      }
      i += 1
    }
    InternalRow(n, kept, UTF8String.fromString(sb.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("mainContent", this, classOf[MainContentExpr].getName)
    val childGen = child.genCode(ctx)
    val jt = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $jt ${ev.value} = ($jt) $ref.evalNullable(
          ${childGen.isNull} ? null : ((Object) ${childGen.value}));
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override def prettyName: String = "main_content"
  override protected def withNewChildInternal(c: Expression): MainContentExpr =
    copy(child = c)
}

object MainContentExpr {

  /** Comments, script/style blocks, and the head — dropped wholesale
    * before block segmentation (`extract_text`'s rule, plus `head`:
    * `title`/`meta` are metadata, not authored body content).
    */
  private val HeadBlocks = java.util.regex.Pattern.compile(
    "(?is)<!--.*?-->|<(script|style)[^>]*>.*?</(script|style)>|<head[^>\\w].*?</head\\s*>|<head>.*?</head\\s*>")

  /** Block-level tag boundaries (HTML living standard's flow-content
    * set — the jusText segmentation points). Inline tags (`a b i span em
    * strong img`) do NOT split blocks.
    */
  private val BlockBoundary = java.util.regex.Pattern.compile(
    "(?i)</?(p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th|caption|" +
      "blockquote|pre|section|article|header|footer|nav|aside|main|figure|figcaption|" +
      "form|fieldset|legend|hr|br|body|html|address|details|summary|dialog|" +
      "select|option|textarea|noscript)\\b[^>]*>")

  private val Anchor = java.util.regex.Pattern.compile(
    "(?is)<a\\b[^>]*>(.*?)</a\\s*>")

  private val AnyTag = java.util.regex.Pattern.compile("<[^>]*>")
  private val Spaces = java.util.regex.Pattern.compile("\\s+")

  /** Visible text of a markup fragment: strip tags, decode the same five
    * entities as `extract_text` (`&amp;` LAST), collapse whitespace, trim.
    */
  private[plans] def visible(fragment: String): String = {
    var s = AnyTag.matcher(fragment).replaceAll(" ")
    s = s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ")
    s = s.replace("&amp;", "&")
    Spaces.matcher(s).replaceAll(" ").trim
  }

  /** Gopher's stop-word set as a fraction of the block's tokens —
    * jusText's stoplist-density signal over the engine's shared
    * vocabulary ([[graft.quality.GopherRules.StopWords]]).
    */
  private val Stop: java.util.Set[String] = {
    val s = new java.util.HashSet[String]()
    graft.quality.GopherRules.StopWords.foreach(s.add)
    s
  }

  private[plans] def stopFrac(text: String): Double = {
    var tokens = 0
    var stop = 0
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      if (i < n) {
        val start = i
        while (i < n && text.charAt(i) != ' ') i += 1
        tokens += 1
        if (Stop.contains(text.substring(start, i).toLowerCase(java.util.Locale.ROOT)))
          stop += 1
      }
    }
    if (tokens == 0) 0.0 else stop.toDouble / tokens
  }
}
