package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC ingestion — the true entry point of a crawl pipeline, one
  * stage ahead of [[Html]]: crawled corpora land as WARC files (one
  * file = many length-framed records), and the FILE is the unit of
  * parallelism — each row here is one file's content, records explode
  * INSIDE the scan task exactly as a real warc reader streams them, so
  * at 100 TB the stage is a map-only generate with zero shuffles and
  * file-count parallelism (the [[Sentences]]/[[Html]] posture).
  *
  * Framing is the Content-Length walk of
  * [[graft.functions.WarcRecords]] — NOT a regex split on the version
  * line, which mis-frames any payload that quotes `WARC/1.0` (spec-
  * pinned). Header-field extraction on top is declarative
  * `regexp_extract` (codegen'd, `(?m)` anchored), and the HTTP
  * response payload splits into status/mime/body at its own blank
  * line.
  *
  * Gzip note: production WARCs are per-record gzip members; this
  * operator takes decompressed text (Spark's codec layer or a
  * binaryFiles decode feeds it) — the framing/parse semantics are
  * identical and that is the deliverable here.
  */
object Warc {

  private def header(h: Column, name: String): Column =
    regexp_extract(h, s"(?m)^$name: (\\S+)", 1)

  /** Explode WARC file contents into framed records:
    * (fileCol, rec_no, warc_type, url, warc_date, content_length,
    * headers, payload), rec_no 1-based in file order.
    */
  def records(files: DataFrame, fileCol: String, contentCol: String): DataFrame =
    files
      .select(col(fileCol),
        posexplode(graft.functions.GraftFunctions.warc_records(
          col(contentCol))).as(Seq("__p", "__r")))
      .select(col(fileCol), (col("__p") + 1).cast("long").as("rec_no"),
        header(col("__r.headers"), "WARC-Type").as("warc_type"),
        header(col("__r.headers"), "WARC-Target-URI").as("url"),
        header(col("__r.headers"), "WARC-Date").as("warc_date"),
        // regexp_extract yields '' on a missing header — NULL the
        // length instead of tripping the ANSI cast
        nullif(header(col("__r.headers"), "Content-Length"), lit(""))
          .cast("long").as("content_length"),
        col("__r.headers").as("headers"), col("__r.payload").as("payload"))

  /** [[records]] narrowed to parsed HTTP responses:
    * (fileCol, rec_no, url, warc_date, status, mime, body). The HTTP
    * block splits at its own blank line; `status`/`mime` come off the
    * status line and HTTP headers; non-response records drop.
    */
  def responses(files: DataFrame, fileCol: String, contentCol: String): DataFrame =
    records(files, fileCol, contentCol)
      .where(col("warc_type") === "response")
      .select(col(fileCol), col("rec_no"), col("url"), col("warc_date"),
        nullif(regexp_extract(col("payload"), "^HTTP/1\\.1 (\\d+)", 1),
          lit("")).cast("long").as("status"),
        // header fields come off the HTTP HEAD block only — a body is
        // free to contain "Content-Type:" lines of its own
        regexp_extract(substring_index(col("payload"), "\r\n\r\n", 1),
          "(?m)^Content-Type: ([^\\r\\n]+)", 1).as("mime"),
        regexp_extract(col("payload"), "(?s)^.*?\\r\\n\\r\\n(.*)$", 1)
          .as("body"))
}
