package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder: the m-subspace nearest-centroid argmin as one tight
  * primitive loop. The declarative form (transform × zip_with × struct
  * array_max over a codebook literal) interprets two Catalyst lambdas per
  * centroid element — ~m·k·w boxed evaluations per vector — and measured
  * 2.2 s of pq65's bench time at sf0.1; this loop is the same arithmetic
  * in flat double arrays.
  *
  * EXACTNESS CONTRACT (the DuckDB oracle hash-checks it): every dot is a
  * LEFT FOLD (sequential loop sum), the distance is evaluated exactly as
  * `⟨sv,sv⟩ − 2.0·⟨sv,cv⟩ + ⟨cv,cv⟩` in that association order, floats are
  * widened to double before any arithmetic, and ties keep the smaller code
  * (strict `<` while scanning codes in ascending order). `‖cv‖²` is
  * precomputed once per expression instance with the same left fold.
  */
case class PqEncodeExpr(child: Expression, cb: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = cb.size
  private val k = cb.head.size
  private val w = cb.head.head.size

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val cents: Array[Array[Array[Double]]] =
    cb.map(_.map(_.toArray).toArray).toArray

  @transient private lazy val cnorm: Array[Array[Double]] =
    cents.map(_.map { cv =>
      var acc = 0.0
      var i = 0
      while (i < cv.length) { acc += cv(i) * cv(i); i += 1 }
      acc
    })

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // fail fast on a dimension mismatch (MatVecExpr's rule): silently
    // encoding a truncated or over-long vector against the codebook would
    // emit plausible-looking but wrong codes and poison every downstream
    // ADC score — one corrupt row must fail loudly, not pass quietly
    require(n == m * w,
      s"pq_encode: vector has $n dims but the codebook expects ${m * w} ($m subspaces × $w)")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val base = s * w
      var svv = 0.0
      var j = 0
      while (j < w) { val x = v(base + j); svv += x * x; j += 1 }
      var best = -1
      var bestD = 0.0
      var c = 0
      while (c < k) {
        val cv = cents(s)(c)
        var dot = 0.0
        j = 0
        while (j < w) { dot += v(base + j) * cv(j); j += 1 }
        val d2 = svv - 2.0 * dot + cnorm(s)(c)
        if (best < 0 || d2 < bestD) { best = c; bestD = d2 }
        c += 1
      }
      codes(s) = best.toLong
      s += 1
    }
    new GenericArrayData(codes)
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused (the
  // MinHashSigs pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr = copy(child = c)
}

/** Native dense mat-vec `y = M·x` (`y(i) = Σ_j M(i)(j)·x(j)`, left-fold row
  * dots, floats widened to double first): the row-local rotation that makes
  * full OPQ ([[graft.similarity.Pq.trainOpq]]) usable at corpus scale — the
  * d×d matrix rides the plan once (d=64 → 32 KB), each vector pays one
  * primitive-loop multiply, nothing shuffles. The declarative equivalent
  * (transform over a matrix literal with a zip_with dot per output dim)
  * interprets d² lambda evaluations per row; this is the same arithmetic in
  * flat arrays, eval-bridged to stay inside whole-stage codegen.
  */
case class MatVecExpr(child: Expression, mat: Seq[Seq[Double]])
    extends UnaryExpression {

  private val d = mat.size
  require(mat.forall(_.size == mat.head.size), "mat_vec needs a rectangular matrix")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec needs array<float|double>, got ${other.catalogString}")
  }

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val rows: Array[Array[Double]] = mat.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // fail fast on a dimension mismatch: silently truncating or zero-padding
    // would return a plausible-looking but mathematically wrong rotation and
    // poison every downstream PQ code/score (constant-time check against the
    // materialized array — this runs per row)
    require(n == rows(0).length,
      s"mat_vec: vector has $n dims but the matrix has ${rows(0).length} columns")
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val y = new Array[Double](d)
    i = 0
    while (i < d) {
      val r = rows(i)
      var acc = 0.0
      var j = 0
      while (j < n) { acc += r(j) * x(j); j += 1 }
      y(i) = acc
      i += 1
    }
    new GenericArrayData(y)
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused (the
  // MinHashSigs pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVec", this, classOf[MatVecExpr].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override def prettyName: String = "mat_vec"
  override protected def withNewChildInternal(c: Expression): MatVecExpr = copy(child = c)
}
