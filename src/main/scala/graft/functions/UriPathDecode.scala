package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-3986 percent-decode of a URI *path* — `%XX` → byte, everything else
  * verbatim. Spark's `_metadata.file_path` is the percent-encoded
  * `Path.toUri.toString` (`region=North America` surfaces as
  * `region=North%20America`), while Delta action paths are stored decoded,
  * so every extraction of a table-relative path from the metadata column
  * must pass through this to land in action-path space.
  *
  * NOT `url_decode`: that implements application/x-www-form-urlencoded,
  * which maps a literal `+` in a file name to a space — URI paths keep `+`
  * verbatim. Decoding operates on the raw UTF-8 bytes (a percent-encoded
  * multi-byte char decodes to its original bytes, no charset round-trip).
  *
  * Malformed escapes (`%` not followed by two hex digits) copy through
  * verbatim — `Path.toUri` never produces them; leniency beats throwing in
  * a per-row kernel. Codegen'd via a static-helper call so the expression
  * stays inside whole-stage codegen.
  */
case class UriPathDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"uri_path_decode needs a string column, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    UriPathDecode.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UriPathDecode.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): UriPathDecodeExpr =
    copy(child = newChild)
}

object UriPathDecode {

  /** Static decode kernel shared by eval and codegen. Returns the input
    * object unchanged when no `%` escape is present — the common case for
    * clean paths — scanning in place via `getByte` (the previous version
    * copied the whole string out of its UnsafeRow backing just to scan,
    * and built the escape path through a synchronized per-byte
    * ByteArrayOutputStream plus a final copy; r12 review). Decoded output
    * is never longer than the input, so the escape path is one exact-size
    * array and one slice-framed result. */
  def decode(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var i = 0
    var hasEscape = false
    while (i < n && !hasEscape) {
      if (s.getByte(i) == '%' && i + 2 < n &&
          isHex(s.getByte(i + 1)) && isHex(s.getByte(i + 2)))
        hasEscape = true
      i += 1
    }
    if (!hasEscape) return s
    val b = s.getBytes // one copy, escape path only
    val out = new Array[Byte](b.length)
    var o = 0
    i = 0
    while (i < b.length) {
      val c = b(i)
      if (c == '%' && i + 2 < b.length && isHex(b(i + 1)) && isHex(b(i + 2))) {
        out(o) = ((hexVal(b(i + 1)) << 4) | hexVal(b(i + 2))).toByte
        o += 1
        i += 3
      } else {
        out(o) = c
        o += 1
        i += 1
      }
    }
    UTF8String.fromBytes(out, 0, o)
  }

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')

  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0' else (b | 0x20) - 'a' + 10

  def apply(c: Column): Column =
    ColumnBridge.column(UriPathDecodeExpr(ColumnBridge.catalystExpression(c)))
}
