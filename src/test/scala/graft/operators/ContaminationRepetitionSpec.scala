package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Decontamination (benchmark containment) and Gopher-style repetition
  * gates — the two corpus-hygiene operators a training pipeline runs
  * before token budgets mean anything.
  */
class ContaminationRepetitionSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("a corpus doc embedding a benchmark item is flagged and removed") {
    import spark.implicits._
    val probes = Seq(
      (900L, "what is the capital of france paris is the capital")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // embeds the full benchmark text inside unrelated prose -> containment 1.0
      (1L, "intro words here what is the capital of france paris is the capital and trailing text"),
      // shares a few words but no 3-gram run
      (2L, "the capital city of germany is berlin france is elsewhere"),
      (3L, "completely unrelated content about spark shuffles")
    ).toDF("doc_id", "text")

    val pairs = TextAnalysis.contaminationPairs(
      corpus, probes, "doc_id", "text", n = 3, threshold = 0.8)
      .collect()
    pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe Seq((1L, 900L))
    pairs.head.getDouble(4) shouldBe 1.0 +- 1e-9

    val clean = TextAnalysis.decontaminate(
      corpus, probes, "doc_id", "text", n = 3, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    clean shouldBe Set(2L, 3L)
  }

  test("partial containment respects the threshold") {
    import spark.implicits._
    // probe has 8 words -> 6 distinct 3-gram shingles; corpus doc contains
    // the first 5 words -> 3 of 6 shingles -> containment 0.5
    val probes = Seq((1L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val corpus = Seq((10L, "prefix one two three four five suffix")).toDF("doc_id", "text")
    val at05 = TextAnalysis.contaminationPairs(
      corpus, probes, "doc_id", "text", n = 3, threshold = 0.5).collect()
    at05.map(_.getDouble(4)) shouldBe Array(0.5)
    TextAnalysis.contaminationPairs(
      corpus, probes, "doc_id", "text", n = 3, threshold = 0.51)
      .count() shouldBe 0L
  }

  test("repetition stats: hand-checked values, map-only plan") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a"),          // bigrams: ab ba ab ba -> dup 0.5, top 0.5
      (2L, "all words differ here"), // 3 distinct bigrams -> dup 0, top 1/3
      (3L, "x")                    // shorter than n -> dropped
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs, "doc_id", "text", n = 2)
    val rows = out.orderBy("doc_id").collect()
    rows.map(_.getLong(0)).toSeq shouldBe Seq(1L, 2L)
    rows(0).getLong(1) shouldBe 4L
    rows(0).getDouble(2) shouldBe 0.5
    rows(0).getDouble(3) shouldBe 0.5
    rows(1).getLong(1) shouldBe 3L
    rows(1).getDouble(2) shouldBe 0.0
    rows(1).getDouble(3) shouldBe 0.333333 +- 1e-9

    // per-document function -> no exchange anywhere in the plan
    out.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("RepetitionStats expression == explode+groupBy twin on the fixture") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaExpr = TextAnalysis.repetition(docs, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

    val w = graft.functions.TextFunctions.words(col("text"))
    val grams = docs.select(col("doc_id"), w.as("w"))
      .where(org.apache.spark.sql.functions.size(col("w")) >= 2)
      .select(col("doc_id"), posexplode(col("w")).as(Seq("i", "tok")))
    val twin = grams.alias("a").join(grams.alias("b"),
        col("a.doc_id") === col("b.doc_id") && col("b.i") === col("a.i") + 1)
      .select(col("a.doc_id").as("doc_id"),
        concat_ws(" ", col("a.tok"), col("b.tok")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_grams"),
        count(lit(1)).as("d"),
        max(col("c")).as("t"))
      .select(col("doc_id"), col("n_grams"),
        round(lit(1.0) - col("d") / col("n_grams"), 6).as("dup"),
        round(col("t") / col("n_grams"), 6).as("top"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap

    viaExpr shouldBe twin
    viaExpr.size should be > 0
  }
}
