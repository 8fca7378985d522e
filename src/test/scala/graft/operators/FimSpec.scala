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
      val (id, fmt, nTok, text) = (r.getLong(0), r.getString(1),
        r.getLong(2), r.getAs[String]("text_out"))
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
        .collect().map(r => r.getLong(0) -> r.getAs[String]("text_out"))
        .toMap
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
      val (id, fmt, text) =
        (r.getLong(0), r.getString(1), r.getAs[String]("text_out"))
      val orig = in.where(col("doc_id") === id).collect()(0)
        .getString(1).split("\\s+").toSeq.filter(_.nonEmpty)
      val (p, s, m) = parse(fmt, text)
      (p ++ m ++ s) shouldBe orig
    }
  }

  test("sentinel_clash flags docs whose own tokens collide with the " +
      "sentinels (ambiguous output) so callers can route them out") {
    import spark.implicits._
    val in = Seq(
      (1L, "plain safe text"),
      (2L, "code with <MID> token inside"), // exact token = sentinel
      (3L, "joined<PRE>token is not a clash"), // substring only — fine
      (4L, "t5 style <extra_id_3> leftover")).toDF("doc_id", "text")
    val fim = Fim.transform(in, "doc_id", "text", 1.0, 0.5, "c")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("sentinel_clash"))
      .toMap
    fim shouldBe Map(1L -> false, 2L -> true, 3L -> false, 4L -> false)
    val sc = Fim.spanCorrupt(in, "doc_id", "text", 0.3, 2, "c")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("sentinel_clash"))
      .toMap
    // conservative substring check: doc 4 flags (even mid-token it would)
    sc shouldBe Map(1L -> false, 2L -> false, 3L -> false, 4L -> true)
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

  /** Reassemble the original token stream from a span-corruption pair:
    * walk input, replacing `<extra_id_k>` with target's k-th span.
    */
  private def reassemble(input: String, target: String): Seq[String] = {
    val sentinel = "<extra_id_(\\d+)>".r
    val tToks = target.split(" ").toSeq
    val spanStarts = tToks.zipWithIndex.collect {
      case (t, i) if sentinel.matches(t) => i
    }
    val spans = spanStarts.sliding(2).collect {
      case Seq(a, b) => tToks.slice(a + 1, b)
    }.toSeq
    input.split(" ").toSeq.filter(_.nonEmpty).flatMap {
      case sentinel(k) => spans(k.toInt)
      case t => Seq(t)
    }
  }

  test("span corruption: splicing target spans back into the input " +
      "reproduces every original token stream; rate tracks; " +
      "deterministic; a new salt redraws") {
    val in = docs(300)
    val orig = in.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").toSeq).toMap
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Fim.spanCorrupt(d, "doc_id", "text", rate = 0.3, spanLen = 2,
        salt = salt).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getAs[String]("input"), r.getAs[String]("target")))
        .toMap
    val out = run(in, "s0")
    out.keySet shouldBe orig.keySet
    var corrupted = 0L; var total = 0L
    out.foreach { case (id, (nTok, nSpans, input, target)) =>
      nTok shouldBe orig(id).length.toLong
      reassemble(input, target) shouldBe orig(id)
      // target format: k numbered spans + one close sentinel
      "<extra_id_".r.findAllIn(target).length shouldBe nSpans + 1
      corrupted += nTok - input.split(" ")
        .count(t => !t.startsWith("<extra_id_"))
      total += nTok
    }
    // expected corrupted fraction ~ rate (merged overlaps pull it
    // slightly under; 300 docs of 1-17 tokens -> wide tolerance)
    corrupted.toDouble / total shouldBe 0.3 +- 0.12
    out.count(_._2._2 > 0) should be > 0
    run(in.repartition(7), "s0") shouldBe out // partitioning-invariant
    run(in, "s1") should not be out // new epoch, new spans
  }

  test("FIM transform totality + reconstruction over arbitrary " +
      "unicode corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val tokGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.oneOf('a', 'Z', '9', 'é', 'ü', '中', 'λ', '!', '_', '%',
        '"', '\\')).map(_.mkString))
    val docGen = for {
      id <- Gen.choose(0L, 100000L)
      n <- Gen.choose(0, 25)
      toks <- Gen.listOfN(n, tokGen)
    } yield (id, toks.mkString(" "))
    val corpusGen = Gen.choose(1, 25)
      .flatMap(Gen.listOfN(_, docGen).map(_.distinctBy(_._1)))
    val prop = Prop.forAll(corpusGen) { rows =>
      val out = Fim.transform(rows.toDF("doc_id", "text"), "doc_id",
          "text", fimFraction = 0.7, spmFraction = 0.5, salt = "pz")
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), r.getAs[String]("text_out"))).toMap
      rows.forall { case (id, text) =>
        val orig = text.split("\\s+").toSeq.filter(_.nonEmpty)
        out(id) match {
          case ("plain", t) =>
            t.split("\\s+").toSeq.filter(_.nonEmpty) == orig
          case (fmt, t) =>
            val (p, s, m) = parse(fmt, t)
            (p ++ m ++ s) == orig
        }
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("span corruption totality + reconstruction over arbitrary " +
      "unicode corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // tokens from a hostile alphabet: unicode letters, confusables,
    // punctuation, digits — anything non-whitespace survives wsTokens,
    // and neither the expression nor the reassembly may choke on it
    val tokGen = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n,
      Gen.oneOf('a', 'Z', '9', 'é', 'ü', '中', 'λ', '!', '_', '%',
        ' '.toString.head, '"', '\\')).map(_.mkString))
    val docGen = for {
      id <- Gen.choose(0L, 100000L)
      n <- Gen.choose(0, 25)
      toks <- Gen.listOfN(n, tokGen)
    } yield (id, toks.mkString(" "))
    val corpusGen = Gen.choose(1, 25)
      .flatMap(Gen.listOfN(_, docGen).map(_.distinctBy(_._1)))
    val prop = Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val out = Fim.spanCorrupt(df, "doc_id", "text", 0.4, 2, "fz")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(2), r.getAs[String]("input"),
            r.getAs[String]("target"))).toMap
      rows.forall { case (id, text) =>
        val orig = text.split("\\s+").toSeq.filter(_.nonEmpty)
        val (nSpans, input, target) = out(id)
        reassemble(input, target) == orig &&
          "<extra_id_".r.findAllIn(target).length == nSpans + 1
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("span corruption degenerate cases: no-span draws pass the text " +
      "verbatim with a close sentinel; knobs validate") {
    import spark.implicits._
    val one = Seq((999L, "alpha beta gamma")).toDF("doc_id", "text")
    // rate tiny enough that this id draws no span
    val r = Fim.spanCorrupt(one, "doc_id", "text", rate = 1e-9)
      .collect()(0)
    r.getLong(2) shouldBe 0L
    r.getAs[String]("input") shouldBe "alpha beta gamma"
    r.getAs[String]("target") shouldBe "<extra_id_0>"
    an[Exception] should be thrownBy
      Fim.spanCorrupt(one, "doc_id", "text", rate = 1.5).collect()
    an[Exception] should be thrownBy
      Fim.spanCorrupt(one, "doc_id", "text", 0.3, spanLen = 0).collect()
  }
}
