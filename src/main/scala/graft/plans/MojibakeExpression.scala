package graft.plans

import java.nio.charset.{CharacterCodingException, Charset, StandardCharsets}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the single most common web-text encoding defect:
  * UTF-8 bytes decoded as Windows-1252/Latin-1 ("café" shipped as
  * "cafÃ©", "don’t" as "donâ€™t"). The fix is the published ftfy core
  * trick (Speer, ftfy — public): re-ENCODE the text as Windows-1252 and
  * strictly re-DECODE the bytes as UTF-8; when that round-trip succeeds
  * the string was mojibake (a genuine non-ASCII text virtually never
  * forms valid UTF-8 byte sequences under the 1252 inverse map).
  *
  * Acceptance is deliberately conservative (a curation gate must never
  * corrupt clean text):
  *   - rows without a telltale lead char pass through via a zero-alloc
  *     scan: every UTF-8 lead byte is 0xC2-0xF4, and Windows-1252 maps
  *     that whole byte range identically onto U+00C2..U+00F4 (`Â`..`ô`),
  *     so ONE range test per char covers every possible mojibake;
  *   - the 1252 re-encode must cover every char and the UTF-8 re-decode
  *     must be byte-strict (both REPORT mode) — any malformation keeps
  *     the original ("SÃO " with a bare `Ã ` aborts at the decode);
  *   - the result must be strictly shorter (a real fix always collapses
  *     a multi-char sequence into one char);
  *   - PLAUSIBILITY (the ftfy badness idea, minimal form): a round that
  *     would mint a char at U+3000 or beyond from input that had none is
  *     rejected — `"dä—“"` is byte-identical to the mojibake of a CJK
  *     char (E4 97 93) and only the implausibility of CJK appearing from
  *     Latin text tells them apart. The deliberate flip side: CJK/emoji
  *     mojibake is left UNTOUCHED rather than risk corrupting genuine
  *     Latin text — the conservative side of the trade.
  * Doubly-encoded text unwinds by iterating to a fixpoint (≤3 passes —
  * ftfy's own bound). Row-local, eval-bridged (the BpeSubwords posture),
  * zero shuffle, stream-safe.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"fix_mojibake expects string, got $other")
  }

  @transient private lazy val cp1252 = Charset.forName("windows-1252")

  private def hasTelltale(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 'Â' && c <= 'ô') return true
      i += 1
    }
    false
  }

  private def decodeOnce(s: String): String =
    if (!hasTelltale(s)) null
    else
      try {
        val bytes = cp1252.newEncoder() // REPORT by default
          .encode(java.nio.CharBuffer.wrap(s))
        val fixed = StandardCharsets.UTF_8.newDecoder()
          .decode(bytes).toString
        if (fixed.length < s.length &&
          !(fixed.exists(_ >= '\u3000') && !s.exists(_ >= '\u3000'))) fixed
        else null
      } catch {
        case _: CharacterCodingException => null
      }

  override def nullSafeEval(input: Any): Any = {
    val s0 = input.asInstanceOf[UTF8String].toString
    var cur = s0
    var rounds = 0
    var next = decodeOnce(cur)
    while (next != null && rounds < 3) {
      cur = next
      rounds += 1
      next = decodeOnce(cur)
    }
    if (rounds == 0) input else UTF8String.fromString(cur)
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fixMojibake", this, classOf[FixMojibake].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "fix_mojibake"
  override protected def withNewChildInternal(c: Expression): FixMojibake = copy(child = c)
}
