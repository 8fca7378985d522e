package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-Length-driven WARC record framing of one WARC file's text:
  * `array<struct<headers, payload>>` in file order.
  *
  * A WARC record is `WARC/1.0\r\n`, header lines, a blank line, a
  * content block of exactly `Content-Length` BYTES, and a `\r\n\r\n`
  * record separator. The honest framing walks the declared lengths —
  * a regex split on the version line would mis-frame any payload that
  * CONTAINS `WARC/1.0\r\n` (archived pages quoting WARC, nested
  * captures), which is why the spec declares lengths at all. The walk
  * runs on UTF-8 BYTES (Content-Length is bytes, payloads may be
  * multi-byte) with one pass and zero-copy slices, the [[WordShingles]]
  * imperative-expression posture.
  *
  * Leniency (the archive-tooling convention): a record with a missing
  * or unparseable Content-Length falls back to scanning for the next
  * `\r\n\r\nWARC/1.0\r\n` boundary (or the end of file); leading
  * noise before the first version line is skipped; a truncated final
  * content block yields the bytes that exist. `headers` excludes the
  * version line; `payload` excludes the record separator.
  */
case class WarcRecords(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("headers", StringType, nullable = false),
    StructField("payload", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "warc_records"

  private val Version = "WARC/1.0\r\n".getBytes("UTF-8")
  private val BlankLine = "\r\n\r\n".getBytes("UTF-8")
  private val ClName = "content-length:".getBytes("UTF-8")

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    var i = math.max(from, 0)
    val last = hay.length - needle.length
    while (i <= last) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  /** Case-insensitive Content-Length value from a header block, -1 if
    * absent/unparseable. Header names are ASCII; only ASCII letters
    * need folding.
    */
  private def contentLength(h: Array[Byte], from: Int, until: Int): Long = {
    var i = from
    while (i < until) {
      // at a line start, try to match "content-length:" case-insensitively
      var j = 0
      while (j < ClName.length && i + j < until) {
        val c = h(i + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        if (lc != ClName(j)) j = ClName.length + 1 else j += 1
      }
      if (j == ClName.length) {
        var k = i + ClName.length
        while (k < until && h(k) == ' ') k += 1
        var v = 0L; var any = false
        while (k < until && h(k) >= '0' && h(k) <= '9') {
          v = v * 10 + (h(k) - '0'); any = true; k += 1
        }
        return if (any) v else -1L
      }
      // skip to the next line
      val nl = indexOf(h, Array('\r'.toByte, '\n'.toByte), i)
      if (nl < 0 || nl + 2 >= until) return -1L
      i = nl + 2
    }
    -1L
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var pos = indexOf(bytes, Version, 0)
    while (pos >= 0) {
      val hStart = pos + Version.length
      val hEnd = indexOf(bytes, BlankLine, hStart)
      if (hEnd < 0) {
        pos = -1 // header block never terminates: drop the tail
      } else {
        val cStart = hEnd + BlankLine.length
        val cl = contentLength(bytes, hStart, hEnd)
        val cEnd =
          if (cl >= 0) math.min(cStart + cl, bytes.length.toLong).toInt
          else {
            // lenient fallback: scan for the next record boundary
            val sep = "\r\n\r\nWARC/1.0\r\n".getBytes("UTF-8")
            val nxt = indexOf(bytes, sep, cStart)
            if (nxt < 0) bytes.length else nxt
          }
        out += InternalRow(
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, hStart, hEnd)),
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, cStart, cEnd)))
        pos = indexOf(bytes, Version, cEnd)
      }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
