package graft

import scala.util.Random

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ProtoCodec, ProtoField, ProtoSchema, ProtoType}

/** Seeded randomized round-trip fuzz for the descriptor-driven wire codec —
  * the reference's own testing posture (`testing/.../RandomExtension.java`
  * logs its seed for replay). The r13 packed-fixed-scalar gap was exactly
  * this bug class: a legal wire form the hand-written vectors never covered.
  *
  * Replay a failure with `sbt -Dgraft.fuzz.seed=<seed> test`; the default is
  * fixed so the round gate stays deterministic, and the builder sweeps many
  * seeds in-session.
  */
class ProtoCodecFuzzSpec extends AnyFunSuite {

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260815L)

  // -- generators -----------------------------------------------------------

  private val scalarTypes = Array[ProtoType](
    ProtoType.Int64, ProtoType.Int32, ProtoType.Bool, ProtoType.PDouble,
    ProtoType.PFloat, ProtoType.PString, ProtoType.PBytes)

  private def genSchema(rnd: Random, depth: Int): ProtoSchema = {
    val n = 1 + rnd.nextInt(8)
    // field numbers: mostly small, some large (multi-byte varint tags);
    // distinct by construction
    val numbers = rnd.shuffle(
      ((1 to 16) ++ Seq(200, 3000, 70000, 536870911)).toList).take(n)
    ProtoSchema(numbers.zipWithIndex.map { case (num, i) =>
      val t =
        if (depth > 0 && rnd.nextInt(5) == 0)
          ProtoType.Message(genSchema(rnd, depth - 1))
        else scalarTypes(rnd.nextInt(scalarTypes.length))
      ProtoField(num, s"f$i", t, repeated = rnd.nextInt(10) < 3)
    })
  }

  /** Random valid-codepoint string (no unpaired surrogates — UTF-8 transit
    * is lossy for those by definition, not a codec defect).
    */
  private def genString(rnd: Random): UTF8String = {
    val sb = new java.lang.StringBuilder
    (0 until rnd.nextInt(12)).foreach { _ =>
      var cp = rnd.nextInt(0x10FFFF + 1)
      while (cp >= 0xD800 && cp <= 0xDFFF) cp = rnd.nextInt(0x10FFFF + 1)
      sb.appendCodePoint(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private def genScalar(rnd: Random, t: ProtoType): Any = t match {
    case ProtoType.Int64 => rnd.nextInt(4) match {
      case 0 => rnd.nextLong()
      case 1 => Long.MinValue
      case 2 => Long.MaxValue
      case _ => rnd.nextInt(100).toLong - 50L
    }
    case ProtoType.Int32 => rnd.nextInt(4) match {
      case 0 => rnd.nextInt()
      case 1 => Int.MinValue
      case 2 => Int.MaxValue
      case _ => rnd.nextInt(100) - 50
    }
    case ProtoType.Bool => rnd.nextBoolean()
    case ProtoType.PDouble => rnd.nextInt(5) match {
      case 0 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bits, incl. NaNs
      case 1 => Double.NaN
      case 2 => Double.NegativeInfinity
      case 3 => -0.0d
      case _ => rnd.nextDouble() * 1e6 - 5e5
    }
    case ProtoType.PFloat => rnd.nextInt(4) match {
      case 0 => java.lang.Float.intBitsToFloat(rnd.nextInt())
      case 1 => Float.NaN
      case 2 => -0.0f
      case _ => rnd.nextFloat() * 1e3f
    }
    case ProtoType.PString => genString(rnd)
    case ProtoType.PBytes =>
      val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b); b
    case ProtoType.Message(s) => genRow(rnd, s)
  }

  private def genRow(rnd: Random, schema: ProtoSchema): InternalRow =
    new GenericInternalRow(schema.fields.map { f =>
      if (rnd.nextInt(4) == 0) null
      else if (f.repeated)
        new GenericArrayData(
          Array.fill[Any](rnd.nextInt(5))(genScalar(rnd, f.ptype))): Any
      else genScalar(rnd, f.ptype)
    }.toArray)

  // -- canonical comparison -------------------------------------------------

  /** Comparable view of one field value. Empty repeated fields canonicalize
    * to null: proto3's wire form cannot distinguish an empty repeated field
    * from an absent one (nothing is written either way), so the round trip
    * is defined up to that equivalence. Float/double compare via to*Bits
    * (encode canonicalizes NaN payloads on both sides identically).
    */
  private def canon(v: Any, f: ProtoField): Any = {
    def one(x: Any): Any = f.ptype match {
      case ProtoType.PDouble    => java.lang.Double.doubleToLongBits(x.asInstanceOf[Double])
      case ProtoType.PFloat     => java.lang.Float.floatToIntBits(x.asInstanceOf[Float])
      case ProtoType.PString    => x.asInstanceOf[UTF8String].toString
      case ProtoType.PBytes     => x.asInstanceOf[Array[Byte]].toSeq
      case ProtoType.Message(s) => canonRow(x.asInstanceOf[InternalRow], s)
      case _                    => x
    }
    if (v == null) null
    else if (f.repeated) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == 0) null
      else (0 until arr.numElements()).map(i => one(arr.get(i, elemType(f)))).toVector
    } else one(v)
  }

  private def elemType(f: ProtoField) = f.ptype match {
    case ProtoType.Int64      => org.apache.spark.sql.types.LongType
    case ProtoType.Int32      => org.apache.spark.sql.types.IntegerType
    case ProtoType.Bool       => org.apache.spark.sql.types.BooleanType
    case ProtoType.PDouble    => org.apache.spark.sql.types.DoubleType
    case ProtoType.PFloat     => org.apache.spark.sql.types.FloatType
    case ProtoType.PString    => org.apache.spark.sql.types.StringType
    case ProtoType.PBytes     => org.apache.spark.sql.types.BinaryType
    case ProtoType.Message(s) => s.sparkSchema
  }

  private def canonRow(row: InternalRow, schema: ProtoSchema): Vector[Any] =
    schema.fields.zipWithIndex.map { case (f, i) =>
      canon(if (row.isNullAt(i)) null else row.get(i, schema.sparkType(f)), f)
    }.toVector

  // -- the fuzz -------------------------------------------------------------

  test(s"encode-decode round trip over 2000 random (schema, row) pairs [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    (0 until 2000).foreach { i =>
      val schema = genSchema(rnd, depth = 2)
      val row = genRow(rnd, schema)
      val want = canonRow(row, schema)
      val bytes = ProtoCodec.encode(schema, row)
      val got =
        try canonRow(ProtoCodec.decode(schema, bytes), schema)
        catch {
          case e: Exception =>
            fail(s"case $i (seed=$seed): decode threw $e on own encode; " +
              s"schema=$schema bytes=${bytes.map("%02x".format(_)).mkString}")
        }
      assert(got == want,
        s"case $i (seed=$seed): round trip diverged; schema=$schema\n got=$got\nwant=$want")
    }
  }

  test(s"decode of random garbage never crashes outside IllegalArgumentException [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed ^ 0x9E3779B97F4A7C15L)
    (0 until 2000).foreach { i =>
      val schema = genSchema(rnd, depth = 1)
      val bytes = new Array[Byte](rnd.nextInt(64))
      rnd.nextBytes(bytes)
      try { ProtoCodec.decode(schema, bytes); () }
      catch {
        case _: IllegalArgumentException => () // the documented malformed-input contract
        case e: Throwable =>
          fail(s"case $i (seed=$seed): garbage decode crashed with ${e.getClass.getName}: " +
            s"${e.getMessage}; bytes=${bytes.map("%02x".format(_)).mkString}")
      }
    }
  }

  test(s"decode of a TAMPERED valid encode never crashes outside IAE [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    // garbage rarely has valid tags; mutating REAL encodes probes much deeper
    // into the field readers (truncation mid-value, flipped wire bits,
    // corrupted lengths)
    val rnd = new Random(seed + 1)
    (0 until 2000).foreach { i =>
      val schema = genSchema(rnd, depth = 2)
      val bytes = ProtoCodec.encode(schema, genRow(rnd, schema))
      if (bytes.nonEmpty) {
        val mutated = java.util.Arrays.copyOf(bytes,
          if (rnd.nextBoolean()) bytes.length else 1 + rnd.nextInt(bytes.length))
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          if (mutated.nonEmpty)
            mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
        }
        try { ProtoCodec.decode(schema, mutated); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"case $i (seed=$seed): tampered decode crashed with " +
              s"${e.getClass.getName}: ${e.getMessage}; " +
              s"bytes=${mutated.map("%02x".format(_)).mkString}")
        }
      }
    }
  }
}
