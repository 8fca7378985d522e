package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** BM25 sanity: the scorer must respect the axioms that define it —
  * more matching terms score higher, rarer terms weigh more, term
  * repetition saturates — and its integer inputs must be exact.
  */
class Bm25Spec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scores(d: org.apache.spark.sql.DataFrame, terms: Seq[String]) =
    TextAnalysis.bm25(d, "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("termStats computes exact tf/df/doc_len") {
    import spark.implicits._
    val out = TextAnalysis.termStats(
      docs(1L -> "data data model x", 2L -> "data y z"),
      "doc_id", "text", Seq("data", "model"))
      .as[(Long, String, Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, "data", 2L, 2L, 4L), (1L, "model", 1L, 1L, 4L),
      (2L, "data", 1L, 2L, 3L))
  }

  test("a document matching more query terms outranks one matching fewer") {
    val d = docs(
      1L -> "data model query filler filler",
      2L -> "data filler filler filler filler",
      3L -> "nothing relevant here at all")
    val s = scores(d, Seq("data", "model", "query"))
    s(1L) should be > s(2L)
    s.get(3L) shouldBe None // no hit, no row
  }

  test("rarer terms contribute more (idf monotonicity)") {
    // 'rare' appears in 1 of 6 docs, 'common' in 5 of 6 — same tf, same len
    val d = docs(
      1L -> "rare pad pad", 2L -> "common pad pad", 3L -> "common x y",
      4L -> "common a b", 5L -> "common c d", 6L -> "common e f")
    val s = scores(d, Seq("rare", "common"))
    s(1L) should be > s(2L)
  }

  test("term repetition saturates (k1 bound): 10x tf is not 10x score") {
    val d = docs(
      1L -> (Seq.fill(10)("data").mkString(" ") + " pad"),
      2L -> "data pad pad pad pad pad pad pad pad pad pad")
    val s = scores(d, Seq("data"))
    s(1L) should be > s(2L)
    s(1L) should be < s(2L) * 3 // far below linear in tf
  }
}
