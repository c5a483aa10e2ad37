package graft

import java.nio.charset.StandardCharsets

import scala.util.Random

import org.apache.spark.sql.functions._

/** Seeded encoding-confusion round-trip fuzz for `http_text`: random text
  * drawn from a charset-safe alphabet is encoded, optionally content-coded
  * (gzip/deflate), optionally transfer-chunked at a random chunk size, the
  * charset declared through a random arm (Content-Type param, `<meta>`
  * tag, BOM, or undeclared-UTF-8-validation), and the full decode chain
  * must recover the EXACT original text. Shares the seeded-suite contract
  * (`-Dgraft.fuzz.seed`) with MojibakeSpec/ExtractTextFuzz.
  */
class HttpTextFuzzSpec extends SparkTestBase {

  private val seed = sys.props.get("graft.fuzz.seed").map(_.toLong).getOrElse(20260816L)

  // per-charset alphabets of chars that ROUND-TRIP in that charset (the
  // identity domain — encode∘decode must be the identity for the oracle)
  private val ascii = (0x20 to 0x7e).map(_.toChar)
  private val cp1252Extra = "éàüñç“”—–‘’€…ŠžŸ".toSeq
  private val sjisExtra = "日本語カタカナひらがな漢字テスト".toSeq
  private val utf8Extra = "éñ日本語😀🎉  ".toSeq

  private case class Cs(label: String, charset: java.nio.charset.Charset, alphabet: IndexedSeq[Char])
  private val charsets = Seq(
    Cs("windows-1252", java.nio.charset.Charset.forName("windows-1252"),
      (ascii ++ cp1252Extra).toIndexedSeq),
    Cs("shift_jis", java.nio.charset.Charset.forName("windows-31j"),
      (ascii ++ sjisExtra).toIndexedSeq),
    Cs("utf-8", StandardCharsets.UTF_8, (ascii ++ utf8Extra).toIndexedSeq))

  private def genText(rnd: Random, alphabet: IndexedSeq[Char]): String = {
    val n = 1 + rnd.nextInt(400)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
    // the meta-sniff window must not be spoofed by accident: strip any
    // '<' the generator minted so the only meta tag is the one we inject
    sb.toString.replace('<', '(')
  }

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out); gz.write(b); gz.close()
    out.toByteArray
  }

  private def zlib(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6); d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def zstd(b: Array[Byte]): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(b, 3)

  private def chunked(b: Array[Byte], size: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    b.grouped(size).foreach { g =>
      out.write(s"${Integer.toHexString(g.length)}\r\n".getBytes)
      out.write(g); out.write("\r\n".getBytes)
    }
    out.write("0\r\n\r\n".getBytes)
    out.toByteArray
  }

  test(s"1000 random (charset × declaration × coding × chunking) wraps decode exactly [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed)
    val cases = (0 until 1000).map { i =>
      val cs = charsets(rnd.nextInt(charsets.length))
      // declaration arm: 0 header, 1 meta, 2 BOM (utf-8 only), 3 undeclared
      // (utf-8 only — validation must catch it; legacy charsets without a
      // declaration would hit the 1252 fallback by design, not a bug)
      val arm0 = rnd.nextInt(4)
      val arm = if (cs.label != "utf-8" && arm0 >= 2) rnd.nextInt(2) else arm0
      val text0 = genText(rnd, cs.alphabet)
      // the meta arm ships the tag INSIDE the body; others ship text alone
      val text = if (arm == 1)
        s"""<meta charset="${cs.label}"><p>$text0</p>""" else text0
      var body = text.getBytes(cs.charset)
      if (arm == 2) body = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ body
      val coding = rnd.nextInt(4) // 0 identity, 1 gzip, 2 deflate, 3 zstd
      body = coding match {
        case 1 => gzip(body)
        case 2 => zlib(body)
        case 3 => zstd(body)
        case _ => body
      }
      val doChunk = rnd.nextBoolean()
      if (doChunk) body = chunked(body, 1 + rnd.nextInt(37))
      val fields = Seq.newBuilder[String]
      fields += (if (arm == 0) s"Content-Type: text/plain; charset=${cs.label}"
                 else "Content-Type: text/plain")
      if (coding == 1) fields += "Content-Encoding: gzip"
      if (coding == 2) fields += "Content-Encoding: deflate"
      if (coding == 3) fields += "Content-Encoding: zstd"
      if (doChunk) fields += "Transfer-Encoding: chunked"
      val head = ("HTTP/1.1 200 OK" +: fields.result()).mkString("", "\r\n", "\r\n\r\n")
      (i, head.getBytes(StandardCharsets.ISO_8859_1) ++ body, text)
    }
    import spark.implicits._
    val bad = cases.toDF("i", "block", "expected")
      .select(col("i"), col("expected"),
        graft.functions.http_text(col("block")).as("got"))
      .filter(col("got").isNull || col("got") =!= col("expected"))
      .collect()
    assert(bad.isEmpty, s"${bad.length} wraps mis-decoded; first: ${bad.headOption}")
  }

  test(s"400 random coding chains: unsupported codings null the text AND name themselves in the census [seed=$seed]") {
    info(s"graft.fuzz.seed=$seed")
    val rnd = new Random(seed * 31 + 7)
    val unsupported = Vector("br", "compress", "pack200-gzip", "x-snappy")
    val cases = (0 until 400).map { i =>
      val text = genText(rnd, (ascii ++ utf8Extra).toIndexedSeq)
      var body = text.getBytes(StandardCharsets.UTF_8)
      // supported inner coding under the (maybe) unsupported outer one:
      // the census must name the FIRST coding the undo hits, regardless of
      // what it wraps
      val inner = rnd.nextInt(4)
      body = inner match {
        case 1 => gzip(body)
        case 2 => zlib(body)
        case 3 => zstd(body)
        case _ => body
      }
      val breakIt = rnd.nextInt(3) > 0 // 2/3 of cases carry an unsupported coding
      val badCoding = unsupported(rnd.nextInt(unsupported.length))
      // an unsupported coding's bytes are opaque — ship the inner body as-is
      // (the decoder must refuse BEFORE touching them)
      val doChunk = rnd.nextBoolean()
      if (doChunk) body = chunked(body, 1 + rnd.nextInt(23))
      val fields = Seq.newBuilder[String]
      fields += "Content-Type: text/plain"
      val innerName = Seq("", "gzip", "deflate", "zstd")(inner)
      val ce = (if (breakIt) Seq(badCoding) else Seq.empty) ++
        (if (inner > 0) Seq(innerName) else Seq.empty)
      if (ce.nonEmpty) fields += s"Content-Encoding: ${ce.mkString(", ")}"
      if (doChunk) fields += "Transfer-Encoding: chunked"
      val head = ("HTTP/1.1 200 OK" +: fields.result()).mkString("", "\r\n", "\r\n\r\n")
      (i, head.getBytes(StandardCharsets.ISO_8859_1) ++ body, text,
        if (breakIt) badCoding else null)
    }
    import spark.implicits._
    val rows = cases.toDF("i", "block", "expected", "expect_census")
      .select(col("i"), col("expected"), col("expect_census"),
        graft.functions.http_text(col("block")).as("got"),
        graft.functions.http_coding_unsupported(col("block")).as("census"))
      .collect()
    rows.foreach { r =>
      val (expText, expCensus) = (r.getString(1), r.getString(2))
      val (got, census) = (r.getString(3), r.getString(4))
      if (expCensus == null) {
        assert(census == null && got == expText,
          s"supported chain broke: census=$census got=${Option(got).map(_.take(40))}")
      } else {
        assert(got == null, s"unsupported coding $expCensus minted text")
        assert(census == expCensus, s"census said $census, wrapped with $expCensus")
      }
    }
  }
}
