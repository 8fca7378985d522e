package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Fill-in-the-middle transforms: deterministic per (id, salt), exact
  * token-stream reconstruction from the sentinel-joined output, valid
  * cut ranges including degenerate (empty) segments, and fraction
  * tracking for both the transform and the PSM/SPM mix.
  */
class FimSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i =>
      (i, (1 to (i % 17 + 1).toInt).map(k => s"t$k").mkString(" ")))
      .toDF("doc_id", "text")
  }

  /** Parse a PSM/SPM string back into (prefix, suffix, middle) token
    * seqs by sentinel position.
    */
  private def parse(fmt: String, s: String): (Seq[String], Seq[String], Seq[String]) = {
    val toks = s.split(" ").toSeq.filter(_.nonEmpty)
    val (iPre, iSuf, iMid) =
      (toks.indexOf(Fim.PRE), toks.indexOf(Fim.SUF), toks.indexOf(Fim.MID))
    iMid should be > -1
    if (fmt == "psm") {
      iPre shouldBe 0
      (toks.slice(1, iSuf), toks.slice(iSuf + 1, iMid), toks.drop(iMid + 1))
    } else {
      iSuf shouldBe 0
      (toks.slice(iPre + 1, iMid), toks.slice(1, iPre), toks.drop(iMid + 1))
    }
  }

  test("reconstruction: prefix ++ middle ++ suffix is the original " +
      "token stream, for every transformed doc in both formats") {
    val in = docs(400)
    val out = Fim.transform(in, "doc_id", "text", fimFraction = 0.8,
      spmFraction = 0.5, salt = "f")
    val orig = in.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").toSeq).toMap
    val rows = out.collect()
    rows.length shouldBe 400
    var psmSeen = 0; var spmSeen = 0
    rows.foreach { r =>
      val (id, fmt, nTok, text) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))
      nTok shouldBe orig(id).length.toLong
      fmt match {
        case "plain" => text.split(" ").toSeq shouldBe orig(id)
        case f =>
          if (f == "psm") psmSeen += 1 else spmSeen += 1
          val (p, s, m) = parse(f, text)
          (p ++ m ++ s) shouldBe orig(id)
      }
    }
    psmSeen should be > 0
    spmSeen should be > 0
  }

  test("fractions track: ~fimFraction transformed, ~spmFraction of " +
      "those SPM; fimFraction 0 and 1 are exact") {
    val out = Fim.transform(docs(2000), "doc_id", "text", 0.6, 0.5, "g")
      .groupBy("fmt").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (out("psm") + out("spm")).toDouble shouldBe 1200.0 +- 120.0
    out("spm").toDouble shouldBe (out("psm") + out("spm")) / 2.0 +- 120.0
    Fim.transform(docs(300), "doc_id", "text", 0.0)
      .where(col("fmt") =!= "plain").count() shouldBe 0
    Fim.transform(docs(300), "doc_id", "text", 1.0)
      .where(col("fmt") === "plain").count() shouldBe 0
  }

  test("deterministic under repartitioning and re-execution; a new salt " +
      "redraws cuts") {
    val in = docs(200)
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Fim.transform(d, "doc_id", "text", 0.7, 0.5, salt)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    val base = run(in, "e0")
    run(in.repartition(7), "e0") shouldBe base
    run(in, "e0") shouldBe base
    run(in, "e1") should not be base // new epoch, new holes
  }

  test("degenerate docs: single-token and empty-ish texts transform " +
      "without loss (empty segments are legal)") {
    import spark.implicits._
    val in = Seq((1L, "only"), (2L, "a b"), (3L, "   x   "))
      .toDF("doc_id", "text")
    val rows = Fim.transform(in, "doc_id", "text", 1.0, 0.5, "d")
      .collect()
    rows.foreach { r =>
      val (id, fmt, text) = (r.getLong(0), r.getString(1), r.getString(3))
      val orig = in.where(col("doc_id") === id).collect()(0)
        .getString(1).split("\\s+").toSeq.filter(_.nonEmpty)
      val (p, s, m) = parse(fmt, text)
      (p ++ m ++ s) shouldBe orig
    }
  }

  test("knob validation fails loud") {
    intercept[IllegalArgumentException] {
      Fim.transform(docs(5), "doc_id", "text", 1.5)
    }
    intercept[IllegalArgumentException] {
      Fim.transform(docs(5), "doc_id", "text", 0.5, spmFraction = -0.1)
    }
  }

  test("the transform plans map-only: no exchange anywhere") {
    val plan = Fim.transform(docs(50), "doc_id", "text", 0.5)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }
}
