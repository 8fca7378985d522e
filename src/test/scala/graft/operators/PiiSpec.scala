package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** PII scrub: counts match the original text, redaction applies rules in
  * order, the scrub is idempotent, and the quarantine gate flags only
  * over-threshold rows.
  */
class PiiSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
  }

  test("redacts emails, phones and IPs and counts each rule") {
    val out = Pii.scrub(df(
      "mail a@b.org or c.d+x@e-f.co, call 25-989-741-2988, host 10.0.0.1",
      "nothing sensitive here"), "txt")
      .orderBy(col("id")).collect()
    out(0).getAs[Long]("n_email") shouldBe 2L
    out(0).getAs[Long]("n_phone") shouldBe 1L
    out(0).getAs[Long]("n_ipv4") shouldBe 1L
    out(0).getAs[String]("txt_redacted") shouldBe
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP>"
    out(1).getAs[Long]("n_email") shouldBe 0L
    out(1).getAs[String]("txt_redacted") shouldBe "nothing sensitive here"
  }

  test("scrub is idempotent: replacement tokens match no rule") {
    val once = Pii.scrub(df("a@b.org 10.1.2.3 25-989-741-2988"), "txt")
      .select(col("id"), col("txt_redacted").as("txt"))
    val twice = Pii.scrub(once, "txt").collect()(0)
    twice.getAs[Long]("n_email") shouldBe 0L
    twice.getAs[Long]("n_phone") shouldBe 0L
    twice.getAs[Long]("n_ipv4") shouldBe 0L
    twice.getAs[String]("txt_redacted") shouldBe "<EMAIL> <IP> <PHONE>"
  }

  test("word boundaries: digits embedded in longer runs do not match") {
    val out = Pii.scrub(df("x123-456-789-0123y and 1.2.3.4567"), "txt")
      .collect()(0)
    out.getAs[Long]("n_phone") shouldBe 0L
    out.getAs[Long]("n_ipv4") shouldBe 0L
  }

  test("flagged quarantines only rows over the match budget") {
    val d = df(
      "a@b.org c@d.org e@f.org",  // 3 matches
      "a@b.org",                  // 1 match
      "clean")
    val ids = Pii.flagged(d, "txt", maxMatches = 2)
      .select("id").collect().map(_.getLong(0))
    ids shouldBe Array(0L)
  }

  test("custom rule set and ordering are honoured") {
    val redactDigits = Pii.Rule("digits", "\\d+", "#")
    val out = Pii.scrub(df("call 25-989-741-2988 now"), "txt",
      rules = Seq(Pii.Phone, redactDigits)).collect()(0)
    // phone runs first, so the digit rule sees no digits left
    out.getAs[String]("txt_redacted") shouldBe "call <PHONE> now"
    out.getAs[Long]("n_phone") shouldBe 1L
    // counts are on the ORIGINAL text: digit runs are still counted
    out.getAs[Long]("n_digits") shouldBe 4L
  }
}
