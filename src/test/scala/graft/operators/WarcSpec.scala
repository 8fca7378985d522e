package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** WARC framing and parsing: byte-exact Content-Length walks,
  * payloads that QUOTE the version line (the case record-splitting
  * gets wrong), leniency fallbacks, and HTTP response parsing.
  */
class WarcSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val crlf = "\r\n"

  private def mkRecord(uri: String, payload: String,
      wtype: String = "response", clHeader: Option[Int => String] =
        Some(n => s"Content-Length: $n")): String = {
    val cl = clHeader.map(f => f(payload.getBytes("UTF-8").length) + crlf)
      .getOrElse("")
    s"WARC/1.0${crlf}WARC-Type: $wtype${crlf}WARC-Target-URI: $uri$crlf" +
      s"${cl}$crlf$payload$crlf$crlf"
  }

  private def files(contents: String*) = {
    import spark.implicits._
    contents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("file_id", "content")
  }

  private def recs(content: String) =
    Warc.records(files(content), "file_id", "content")
      .orderBy(col("rec_no")).collect()

  test("frames multiple records byte-exactly, multi-byte payloads " +
      "included (Content-Length is BYTES, not chars)") {
    val p1 = "héllo wörld"     // 13 bytes, 11 chars
    val p2 = "plain"
    val out = recs(mkRecord("http://a/1", p1) + mkRecord("http://a/2", p2))
    out.length shouldBe 2
    out.map(_.getAs[String]("payload")).toSeq shouldBe Seq(p1, p2)
    out.map(_.getAs[String]("url")).toSeq shouldBe
      Seq("http://a/1", "http://a/2")
    out.map(_.getAs[Long]("content_length")).toSeq shouldBe Seq(13L, 5L)
    out.map(_.getAs[Long]("rec_no")).toSeq shouldBe Seq(1L, 2L)
  }

  test("a payload QUOTING the version line stays ONE record — the " +
      "case a record-split-on-delimiter reader mis-frames") {
    val quoting = "how to parse WARC/1.0\r\nrecords: WARC/1.0\r\n" +
      "WARC-Type: response\r\n\r\nnested-looking text"
    val out = recs(mkRecord("http://q/1", quoting) +
      mkRecord("http://q/2", "after"))
    out.length shouldBe 2
    out(0).getAs[String]("payload") shouldBe quoting
    out(1).getAs[String]("url") shouldBe "http://q/2"
  }

  test("leniency: missing Content-Length scans to the next boundary, " +
      "leading noise is skipped, a truncated tail yields what exists, " +
      "and the header name is case-insensitive") {
    val noCl = mkRecord("http://l/1", "free-run body", clHeader = None)
    val out = recs("garbage before the first record\r\n" + noCl +
      mkRecord("http://l/2", "second"))
    out.length shouldBe 2
    out(0).getAs[String]("payload") shouldBe "free-run body"
    out(0).isNullAt(out(0).fieldIndex("content_length")) shouldBe true
    // truncated: declared length runs past the end of file
    val trunc = s"WARC/1.0${crlf}WARC-Target-URI: http://l/3$crlf" +
      s"Content-Length: 9999$crlf${crlf}short"
    val t = recs(trunc)
    t.length shouldBe 1
    t(0).getAs[String]("payload") shouldBe "short"
    // case-insensitive header name
    val ci = s"WARC/1.0${crlf}WARC-Target-URI: http://l/4$crlf" +
      s"CONTENT-length: 2$crlf${crlf}okEXTRA$crlf$crlf"
    recs(ci)(0).getAs[String]("payload") shouldBe "ok"
  }

  test("responses: status/mime off the HTTP HEAD only, body after its " +
      "blank line, non-response records dropped") {
    val body = "text with its own\r\nContent-Type: text/fake\r\nline"
    val http = s"HTTP/1.1 404 NF${crlf}Content-Type: text/html$crlf$crlf$body"
    val content = mkRecord("http://r/1", http) +
      mkRecord("http://r/2", "WARC-metadata", wtype = "metadata")
    val out = Warc.responses(files(content), "file_id", "content").collect()
    out.length shouldBe 1
    out(0).getAs[Long]("status") shouldBe 404L
    out(0).getAs[String]("mime") shouldBe "text/html"
    out(0).getAs[String]("body") shouldBe body
  }
}
