package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** The HTTP message body of a WARC `response`/`request` record block: a
  * WARC response record's block is the full HTTP message (status line,
  * headers, CRLF CRLF, body — ISO 28500 §6.3 with
  * `Content-Type: application/http`), and the pipeline wants the body
  * octets. Returns the bytes after the first header/body separator —
  * CRLF CRLF per RFC 9112, with a bare LF LF tolerated (pre-HTTP/1.0
  * servers and sloppy rewrites emit it) — or NULL when no separator
  * exists (the block is not an HTTP message; a `resource` record's block
  * is already the payload). Row-local byte scan, zero copies beyond the
  * body slice, stream-safe; charset decoding is schema-on-read downstream
  * (`cast to string` for UTF-8, [[FixMojibake]] for the crooked rest).
  */
case class HttpBody(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"http_body expects binary, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var i = 0
    var bodyAt = -1
    while (bodyAt < 0 && i < bytes.length) {
      if (bytes(i) == '\n') {
        // separator candidates end at a '\n': CRLFCRLF puts the body at
        // i+1 when bytes(i-2..i) == \n\r\n; bare LFLF at i+1 when \n\n
        if (i >= 1 && bytes(i - 1) == '\n') bodyAt = i + 1
        else if (i >= 2 && bytes(i - 1) == '\r' && bytes(i - 2) == '\n') bodyAt = i + 1
      }
      i += 1
    }
    if (bodyAt < 0) null
    else java.util.Arrays.copyOfRange(bytes, bodyAt, bytes.length)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("httpBody", this, classOf[HttpBody].getName)
    val obj = ctx.freshName("bodyObj")
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object $obj = $ref.nullSafeEval($c);
         |if ($obj == null) { ${ev.isNull} = true; } else { ${ev.value} = (byte[]) $obj; }
       """.stripMargin)
  }

  override def prettyName: String = "http_body"
  override protected def withNewChildInternal(c: Expression): HttpBody = copy(child = c)
}
