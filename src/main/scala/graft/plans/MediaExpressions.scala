package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit media frame fingerprint: bit for region `j` (a 4-char
  * slice of the frame) is the parity of
  * `conv(substring(md5(j ':' region), 1, 15), 16, 10)`, folded MSB-first
  * by Horner — exactly [[graft.multimodal.MediaDedup]]'s declarative
  * definition and its DuckDB oracle (pq67 hash-checks it). The parity of
  * the 15-hex-digit (60-bit) prefix is its lowest bit = hex digit 14's
  * LSB = bit 4 of md5 byte 7, so the loop needs one digest per region and
  * no hex-string materialization. The declarative chain (60 interpreted
  * concat→md5→conv→pmod trees per frame) measured 1.4 s of pq67's bench
  * at sf0.1.
  */
case class MediaFrameFingerprint(child: Expression)
    extends UnaryExpression {

  private val Regions = 60
  private val RegionChars = 4

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_frame_fp needs a string frame, got ${child.dataType.catalogString}")

  // one digest per (thread × deserialized expression copy), not per ROW:
  // getInstance's provider lookup was 60×-amortized but still per-row. The
  // ThreadLocal (vs the earlier plain field) closes the hazard of one
  // interpreted instance shared across threads interleaving update/digest —
  // the Md5HashedText caching rule.
  @transient private lazy val mdCache = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(input: Any): Any = {
    val fs = input.asInstanceOf[UTF8String]
    val md = mdCache.get()
    var acc = 0L
    var j = 0
    while (j < Regions) {
      // region j: chars [j*4, j*4+4) of the frame (UTF8-aware, SQL substring
      // semantics — out-of-range yields the empty suffix, same as the
      // declarative substr)
      val region = fs.substringSQL(j * RegionChars + 1, RegionChars)
      md.reset()
      md.update((j.toString + ":").getBytes("UTF-8"))
      md.update(region.getBytes)
      val dig = md.digest()
      // parity of the 60-bit hex prefix = LSB of hex digit 14 = bit 4 of byte 7
      val parity = (dig(7) >> 4) & 1
      acc = acc * 2 + parity
      j += 1
    }
    acc
  }

  // eval-bridge: shed CodegenFallback so the stage stays fused (the
  // MinHashSigs pattern)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mediaFp", this, classOf[MediaFrameFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def prettyName: String = "media_frame_fp"
  override protected def withNewChildInternal(c: Expression): MediaFrameFingerprint =
    copy(child = c)
}

/** Compression ratio in per-mille: `deflate(text).length · 1000 / max(len,1)`
  * over the UTF-8 bytes, level-6 zlib — the Gopher-style boilerplate/
  * generation-loop signal (highly repetitive text compresses far below
  * natural text; near-random text sits near or above 1000). Deterministic
  * for a fixed JDK zlib, but with no SQL form — the registered query is
  * rows-only with a reference-implementation spec, like the BPE loop.
  */
case class CompressionRatioPm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compression_ratio_pm needs a string, got ${child.dataType.catalogString}")

  // per-(thread × task) Deflater, reset() between rows: constructing (and
  // end()-ing) a native zlib stream per ROW dominated the scoring cost. The
  // ThreadLocal closes the hazard of one interpreted instance evaluated
  // from two threads corrupting a shared native stream, and the
  // task-completion listener end()s the native buffers deterministically at
  // task end instead of leaving reclamation to the GC Cleaner (a finalizer
  // in spirit only — many completed tasks' native buffers could otherwise
  // pile up between collections). Driver-side eval (constant folding of a
  // foldable child) has no TaskContext — that single driver instance stays
  // Cleaner-reclaimed, which is fine at cardinality one.
  @transient private lazy val deflaterCache = new ThreadLocal[java.util.zip.Deflater]()

  private def threadDeflater(): java.util.zip.Deflater = {
    var d = deflaterCache.get()
    if (d == null) {
      d = new java.util.zip.Deflater(6)
      deflaterCache.set(d)
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null) {
        val captured = d
        tc.addTaskCompletionListener[Unit] { _ =>
          captured.end()
          deflaterCache.remove()
        }
      }
    }
    d
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val d = threadDeflater()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = new Array[Byte](256)
    var total = 0L
    while (!d.finished()) total += d.deflate(out)
    total * 1000L / math.max(bytes.length, 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("comprPm", this, classOf[CompressionRatioPm].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((java.lang.Long) $ref.nullSafeEval($c)).longValue();")
  }

  override def prettyName: String = "compression_ratio_pm"
  override protected def withNewChildInternal(c: Expression): CompressionRatioPm =
    copy(child = c)
}
