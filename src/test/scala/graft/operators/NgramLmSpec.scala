package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bigram add-one LM scoring: hand-computed bits on a tiny corpus,
  * partitioning invariance, and the common-vs-rare ordering the filter
  * exists to produce.
  */
class NgramLmSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def corpus(parts: Int) = {
    import spark.implicits._
    // vocab {a,b,c,z} (V=4); bigrams: d1 (a,b)(b,a)(a,b), d2 (a,b)(b,c);
    // d3 has no bigrams but contributes z to the vocab
    Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text").repartition(parts)
  }

  private def score(parts: Int): Map[Long, (Long, Double)] =
    NgramLm.selfScoreBits(corpus(parts), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("hand-computed bits on a fixed corpus") {
    // c(a,b)=3 c(b,a)=1 c(b,c)=1; c(a·)=3 c(b·)=2; V=4
    // p(b|a)=(3+1)/(3+4)  -> log2(7/4)  = 0.807355
    // p(a|b)=(1+1)/(2+4)  -> log2(3)    = 1.584963
    // p(c|b)=(1+1)/(2+4)  -> log2(3)    = 1.584963
    val out = score(parts = 2)
    out(1L) shouldBe ((3L, 1.0666)) // (2*0.807355 + 1.584963)/3
    out(2L) shouldBe ((2L, 1.1962)) // (0.807355 + 1.584963)/2
    out.contains(3L) shouldBe false // <2 tokens: no bigrams, no row
  }

  test("result is identical under any partitioning") {
    val ref = score(1)
    (2 to 5).foreach(p => score(p) shouldBe ref)
  }

  test("repeated common text scores fewer bits than rare text") {
    import spark.implicits._
    val docs = (1L to 20L).map(i => (i, "the cat sat on the mat")) :+
      (99L, "zyx qwv jkl pqr")
    val out = NgramLm.selfScoreBits(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out(1L) should be < out(99L)
  }
}
