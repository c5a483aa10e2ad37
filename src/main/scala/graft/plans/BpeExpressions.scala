package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich, Haddow & Birch 2016; the
  * GPT-2 apply loop) as a native expression — the REAL subword counter
  * behind token budgets, packing, and context-length decisions, upgrading
  * the whitespace/regex approximations in TextFunctions.
  *
  * Semantics per whitespace word: start from code-point symbols, then
  * repeatedly find the LOWEST-RANK merge pair present anywhere in the word
  * and fuse all its left-to-right non-overlapping occurrences, until no
  * pair in the table applies. This is the true greedy loop: a merge can
  * create a new occurrence of an EARLIER-rank pair, which a single
  * rank-ordered pass would miss (BpeSpec pins that case against an
  * independent reference implementation — there is no SQL form, so the
  * registered query is rows-only like pq14/pq35/pq66).
  *
  * 100 TB shape: the merge table is driver-resident vocabulary (a few
  * thousand string pairs baked into the expression, broadcast with the
  * plan); evaluation is row-local with zero shuffle, and the eval-bridge
  * `doGenCode` keeps the surrounding stage in whole-stage codegen (the
  * MinHashSigs pattern).
  */
case class BpeSubwords(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_subwords needs a string input, got ${child.dataType.catalogString}")

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  private def encodeWord(word: String): Array[String] = {
    // code-point symbols (surrogate-pair safe)
    var syms = {
      val b = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < word.length) {
        val cp = word.codePointAt(i)
        b += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      b
    }
    var done = syms.length < 2
    while (!done) {
      // lowest-rank pair present anywhere in the word
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < best => best = r
          case _ =>
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = merges(best)
        val out = mutable.ArrayBuffer.empty[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b
            j += 2
          } else {
            out += syms(j)
            j += 1
          }
        }
        syms = out
        done = syms.length < 2
      }
    }
    syms.toArray
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    new GenericArrayData(words.map { w =>
      new GenericArrayData(
        encodeWord(w).map(s => UTF8String.fromString(s)).asInstanceOf[Array[Any]])
    }.asInstanceOf[Array[Any]])
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused (see
  // MinHashSigs for the rationale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeSubwords", this, classOf[BpeSubwords].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "bpe_subwords"
  override protected def withNewChildInternal(c: Expression): BpeSubwords = copy(child = c)
}
