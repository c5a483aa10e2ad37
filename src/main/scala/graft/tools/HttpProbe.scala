package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throughput probe for the `http_text` decode chain: synthesizes response
  * blocks in the three payload shapes a real crawl carries (plain cp1252,
  * chunked utf-8, gzip+chunked utf-8), times the full decode at data
  * scale, and reports decoded MB/s per arm — so the "row-local, decode-
  * bound" claim is a measured number (the WarcProbe posture). Prints one
  * JSON line; not part of the driver contract.
  *
  * Usage: runMain graft.tools.HttpProbe [nDocs] [bodyBytes]
  */
object HttpProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val bodyBytes = if (args.length > 1) args(1).toInt else 20000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val text = ("The quick brown fox jumps over the lazy dog. " * (bodyBytes / 45 + 1))
      .take(bodyBytes)
    // build each arm ONCE driver-side; the timed region is pure decode
    def wrap(arm: Int): Array[Byte] = {
      def chunk(b: Array[Byte]): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        b.grouped(1024).foreach { g =>
          out.write(s"${Integer.toHexString(g.length)}\r\n".getBytes)
          out.write(g); out.write("\r\n".getBytes)
        }
        out.write("0\r\n\r\n".getBytes); out.toByteArray
      }
      def gz(b: Array[Byte]): Array[Byte] = {
        val out = new java.io.ByteArrayOutputStream()
        val s = new java.util.zip.GZIPOutputStream(out); s.write(b); s.close()
        out.toByteArray
      }
      val (fields, body) = arm match {
        case 0 => (Seq("Content-Type: text/plain; charset=windows-1252"),
          text.getBytes(java.nio.charset.Charset.forName("windows-1252")))
        case 1 => (Seq("Content-Type: text/plain; charset=utf-8",
          "Transfer-Encoding: chunked"), chunk(text.getBytes("UTF-8")))
        case _ => (Seq("Content-Type: text/plain; charset=utf-8",
          "Content-Encoding: gzip", "Transfer-Encoding: chunked"),
          chunk(gz(text.getBytes("UTF-8"))))
      }
      ("HTTP/1.1 200 OK" +: fields).mkString("", "\r\n", "\r\n\r\n")
        .getBytes("ISO-8859-1") ++ body
    }

    def mbps(arm: Int, label: String): (String, Double) = {
      val block = wrap(arm)
      val df = spark.range(nDocs).select(lit(block).as("block")).cache()
      df.count() // materialize outside the timed region
      def run(): Unit = {
        val n = df.select(graft.functions.http_text(col("block")).as("t"))
          .agg(sum(length(col("t")))).collect()
        require(n.head.getLong(0) == nDocs.toLong * text.length, s"$label decoded short")
      }
      run() // warm
      val reps = Seq.fill(3) {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      df.unpersist()
      val sec = reps.sorted.apply(1)
      label -> nDocs.toDouble * bodyBytes / 1048576.0 / sec
    }

    val arms = Seq(mbps(0, "plain_cp1252_mbps"), mbps(1, "chunked_utf8_mbps"),
      mbps(2, "gzip_chunked_utf8_mbps"))
    def num(v: Double): String = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    println(arms.map { case (k, v) => s""""$k":${num(v)}""" }
      .mkString(s"""{"probe":"http_text","n_docs":$nDocs,"body_bytes":$bodyBytes,""", ",", "}"))
    spark.stop()
  }
}
