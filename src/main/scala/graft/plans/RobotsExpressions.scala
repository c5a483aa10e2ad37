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

  /** Parse and select the rule group for `agent` (lowercase product
    * token). Returns (allow, pattern) pairs in file order.
    */
  def rulesFor(text: String, agent: String): Seq[(Boolean, String)] = {
    // groups under construction: (uaTokens, rules)
    val groups = mutable.ArrayBuffer.empty[(mutable.ArrayBuffer[String], mutable.ArrayBuffer[(Boolean, String)])]
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
                groups += ((mutable.ArrayBuffer.empty[String],
                  mutable.ArrayBuffer.empty[(Boolean, String)]))
                collectingUas = true
              }
              groups.last._1 += productToken(value)
            case "allow" | "disallow" =>
              collectingUas = false
              // rules before any user-agent line have no governing group
              // (RFC: rules outside a group are ignored); empty values
              // carry no constraint
              if (groups.nonEmpty && value.nonEmpty)
                groups.last._2 += ((key == "allow", value))
            case _ =>
              collectingUas = false // an ignored directive still ends a UA run
          }
        }
      }
    }
    val exact = groups.filter(_._1.contains(agent))
    val chosen = if (exact.nonEmpty) exact else groups.filter(_._1.contains("*"))
    chosen.flatMap(_._2.toSeq).toSeq
  }

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
