package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** IDN/punycode host folding (RFC 3490/3492 via `java.net.IDN`, part of the
  * JDK): a Unicode hostname and its `xn--` ACE form are the SAME host on
  * the wire, so a crawl dedup/cap key must collapse them —
  * `url_canonicalize` folds the host of any URL carrying non-ASCII to its
  * ASCII (punycode) form, lowercased. Punycode's adaptive base-36 delta
  * coding is a stateful per-label loop no regex subset expresses, hence a
  * native expression (the pq68 eval-bridge posture: `doGenCode` delegates
  * to `nullSafeEval` so the surrounding stage stays inside whole-stage
  * codegen instead of dropping to CodegenFallback).
  *
  * Drop-not-fail: a host `IDN.toASCII` rejects (overlong label, bidi
  * violations) passes through UNCHANGED — a crawl front must never abort a
  * batch on one hostile URL; the malformed form simply keys as itself,
  * exactly how the reference treats undecodable records
  * (decaton: processors/processor/src/main/java/.../DecatonProcessor.java
  * discard semantics; see core/LegacyEnvelope.scala).
  */
case class IdnAscii(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"idn_ascii expects string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    try {
      UTF8String.fromString(
        java.net.IDN.toASCII(s, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT))
    } catch {
      case _: IllegalArgumentException | _: IndexOutOfBoundsException => input
    }
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused (the
  // BpeSubwords/MinHashSigs pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("idnAscii", this, classOf[IdnAscii].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "idn_ascii"
  override protected def withNewChildInternal(c: Expression): IdnAscii = copy(child = c)
}
