package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Token entropy: the degenerate (0-bit), uniform (log2 n), and
  * hand-computed mixed cases, plus empty-doc absence and partitioning
  * invariance.
  */
class TokenEntropySpec extends AnyFunSuite with Matchers with SparkSpec {

  private def entropy(texts: (Long, String)*): Map[Long, (Long, Double)] = {
    import spark.implicits._
    TextAnalysis.tokenEntropy(
        texts.toDF("doc_id", "text").repartition(3), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("degenerate repetition is 0 bits; uniform tokens hit log2 n") {
    val out = entropy(1L -> "spam spam spam spam", 2L -> "a b c d",
      3L -> "a a b", 4L -> "...") // 4: punctuation only -> no tokens
    out(1L) shouldBe ((4L, 0.0))
    out(2L) shouldBe ((4L, 2.0)) // log2(4)
    // H = log2(3) - (2*log2(2) + 1*log2(1))/3 = 1.584963 - 0.666667
    out(3L) shouldBe ((3L, 0.9183))
    out.contains(4L) shouldBe false
  }

  test("entropy is invariant under partitioning") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => i -> s"w$i x y w$i z ${"r " * (i % 5).toInt}")
    val ref = entropy(docs: _*)
    (1 to 4).foreach { p =>
      val out = TextAnalysis.tokenEntropy(
          docs.toDF("doc_id", "text").repartition(p), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      out shouldBe ref
    }
  }

  test("tokenizer fertility aggregates the per-doc token counts exactly") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fert = TextAnalysis.tokenizerFertility(docs, "lang", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // recompute from the per-doc operator + a plain aggregate
    val ref = TextAnalysis.tokenCounts(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("bpe_tokens")).cast("long").as("b"),
        sum(col("ws_tokens")).cast("long").as("w"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    fert.keySet shouldBe ref.keySet
    fert.foreach { case (lang, (n, b, w, f)) =>
      (n, b, w) shouldBe ref(lang)
      f shouldBe math.rint(b.toDouble / w.toDouble * 1e6) / 1e6 +- 1e-9
    }
  }

  test("tokenizer fertility yields NULL, not a crash, for an empty-text group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "real words here", "en"),
      (2L, "   ", "empty"), (3L, "", "empty")
    ).toDF("doc_id", "text", "lang")
    val rows = TextAnalysis.tokenizerFertility(docs, "lang", "text")
      .orderBy("lang").collect()
    rows.map(_.getString(0)) shouldBe Array("empty", "en")
    rows(0).isNullAt(4) shouldBe true // fertility: 0 ws tokens
    rows(0).isNullAt(5) shouldBe true // chars_per_token: 0 bpe tokens
    rows(1).isNullAt(4) shouldBe false
  }
}
