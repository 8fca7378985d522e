package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Blocklist phrase filter: occurrence counting at word granularity
  * (all start positions, so self-overlapping phrases count every hit),
  * normalization through the words() convention, gate/hits agreement,
  * and the gate's zero-shuffle plan.
  */
class BlocklistSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def hits(d: org.apache.spark.sql.DataFrame, phrases: Seq[String]) =
    TextAnalysis.blocklistHits(d, "doc_id", "text", phrases)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

  test("counts every start position, including self-overlapping hits") {
    val h = hits(docs(
      1L -> "a a a b a a",   // "a a": starts 0,1,4 -> 3
      2L -> "x a a y",       // 1
      3L -> "nothing here"),
      Seq("a a"))
    h shouldBe Map((1L, "a a") -> 3L, (2L, "a a") -> 1L)
  }

  test("phrases and text normalize through the words() convention") {
    val h = hits(docs(1L -> "Stop! Bad-Phrase... here, bad phrase again"),
      Seq("BAD, phrase!"))
    h shouldBe Map((1L, "bad phrase") -> 2L)
  }

  test("the public phraseHits normalizes un-normalized phrases (direct " +
      "callers match, not silent zero)") {
    // round-12 change: normalization moved INSIDE phraseHits — a direct
    // caller passing punctuation/case/double spaces must match the
    // tokens words() produces, and already-normalized phrases must
    // count identically (idempotence)
    val d = docs(1L -> "bad phrase here and bad phrase again",
      2L -> "clean text")
    def total(phrases: Seq[String]) =
      d.select(col("doc_id"),
          graft.functions.TextFunctions.phraseHits(
            graft.functions.TextFunctions.words(col("text")), phrases)
            .as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    total(Seq("Bad,  Phrase!")) shouldBe Map(1L -> 2L, 2L -> 0L)
    total(Seq("bad phrase")) shouldBe Map(1L -> 2L, 2L -> 0L)
  }

  test("mixed phrase lengths resolve against their own shingle width") {
    val h = hits(docs(1L -> "one two three one two"),
      Seq("one two", "one two three"))
    h shouldBe Map((1L, "one two") -> 2L, (1L, "one two three") -> 1L)
  }

  test("gate agrees with hits totals and keeps zero-hit docs") {
    val d = docs(
      1L -> "clean document text",
      2L -> "bad phrase once",
      3L -> "bad phrase and bad phrase again",
      4L -> "also spotless")
    val phrases = Seq("bad phrase")
    val survivors = TextAnalysis.blocklistGate(d, "doc_id", "text", phrases)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    survivors shouldBe Set(1L, 4L)
    // maxHits = 1 tolerates the single-hit doc, still drops the double
    TextAnalysis.blocklistGate(d, "doc_id", "text", phrases, maxHits = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 2L, 4L)
    // cross-check: dropped ids are exactly those whose summed hits exceed
    val totals = TextAnalysis.blocklistHits(d, "doc_id", "text", phrases)
      .groupBy("doc_id").agg(sum("n_hits").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    totals.filter(_._2 > 1).keySet shouldBe Set(3L)
  }

  test("the gate is map-only: zero exchanges in the physical plan") {
    val plan = TextAnalysis.blocklistGate(
      docs(1L -> "x y z"), "doc_id", "text", Seq("bad phrase", "worse longer phrase"))
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length shouldBe 0
  }

  test("gate preserves the input schema") {
    val d = docs(1L -> "fine text").withColumn("extra", lit(7))
    TextAnalysis.blocklistGate(d, "doc_id", "text", Seq("bad phrase"))
      .columns.toSeq shouldBe Seq("doc_id", "text", "extra")
  }

  test("null text passes the gate and is absent from hits") {
    import spark.implicits._
    val d = Seq((1L, Option("bad phrase here")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    TextAnalysis.blocklistGate(d, "doc_id", "text", Seq("bad phrase"))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(2L)
    TextAnalysis.blocklistHits(d, "doc_id", "text", Seq("bad phrase"))
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  test("fuzz: gate total always equals the summed hits report (and " +
      "neither throws) on random token soups") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "cc", "ddd", "é", "x1")
    val docs = (1L to 60L).map { i =>
      val n = rnd.nextInt(12)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }.toDF("doc_id", "text")
    val phrases = Seq("a a", "b cc", "ddd é x1", "cc")
    val totals = TextAnalysis.blocklistHits(docs, "doc_id", "text", phrases)
      .groupBy("doc_id").agg(sum("n_hits").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the imperative PhraseHits gate must agree with the explode/join
    // report on every document, for every cut of maxHits
    for (cut <- Seq(0L, 1L, 3L)) {
      val survivors = TextAnalysis
        .blocklistGate(docs, "doc_id", "text", phrases, maxHits = cut)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expected = (1L to 60L).filter(i => totals.getOrElse(i, 0L) <= cut).toSet
      survivors shouldBe expected
    }
  }

  test("degenerate phrases fail loud") {
    val d = docs(1L -> "x")
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistHits(d, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistHits(d, "doc_id", "text", Seq("!!!"))
    }
  }
}
