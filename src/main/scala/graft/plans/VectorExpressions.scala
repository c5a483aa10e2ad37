package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric arrays as one native expression.
  *
  * The declarative form — `aggregate(zip_with(a, b, _*_), 0d, _+_)` — pays a
  * Catalyst lambda interpretation per element per row; at millions of pairs ×
  * 64 dims that dominated the embedding-dedup benchmark. This expression does
  * the identical left-to-right double accumulation (bit-for-bit the same
  * result, which the DuckDB oracle mirrors with list_reduce) in a tight loop.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val leftFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot expects array<float|double>, got ${left.dataType} / ${right.dataType}")
  }

  // Result is null for mismatched lengths or any null element — the same
  // answer the declarative `aggregate(zip_with(a, b, _*_), 0d, _+_)` gives
  // (zip_with pads/propagates null, the sum absorbs it), so the documented
  // parity with the fold form holds on ALL inputs, not just clean ones.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
            $acc += $getA * $getB;
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override def prettyName: String = "vector_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
    copy(left = l, right = r)
}
