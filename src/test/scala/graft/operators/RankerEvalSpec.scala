package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The ranker-evaluation leaderboard ([[RankFusion.ndcgLeaderboard]]):
  * its per-ranker mean must be exactly the integer-micros mean of
  * [[RankFusion.ndcgAtK]]'s per-query scores (the single-homing pin —
  * the leaderboard shares ndcgAtK's components but unions the runs, so
  * this is the no-drift guarantee), n_queries must be identical across
  * runs, and RRF fusion of two rankers that each surface a DIFFERENT
  * slice of the relevant set must grade above both — the fusion-wins
  * property the battery fixture cannot show (its embeddings are
  * independent of its text, so q162 honestly grades hybrid below
  * lexical there).
  */
class RankerEvalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ranking(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "rank", "doc_id")
  }

  private def judged(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "grade")
  }

  private def board(rankings: Seq[(String, org.apache.spark.sql.DataFrame)],
      j: org.apache.spark.sql.DataFrame, k: Int) =
    RankFusion.ndcgLeaderboard(rankings, j, "doc_id", k)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap

  test("leaderboard means equal the integer-micros mean of ndcgAtK's " +
      "per-query scores, duplicates and misses included") {
    val a = ranking((1L, 1L, 5L), (1L, 2L, 6L), (1L, 3L, 5L), // dup doc 5
      (2L, 1L, 9L))
    val b = ranking((1L, 1L, 8L), (2L, 1L, 5L), (2L, 2L, 6L))
    val j = judged((1L, 5L, 3L), (1L, 8L, 2L), (2L, 5L, 1L),
      (3L, 7L, 2L)) // query 3: judged, retrieved by nobody
    val out = board(Seq("a" -> a, "b" -> b), j, k = 5)
    Seq("a" -> a, "b" -> b).foreach { case (name, ranked) =>
      val per = RankFusion.ndcgAtK(ranked, j, "doc_id", k = 5)
        .collect().map(_.getDouble(1))
      val micros = per.map(v => Math.round(v * 1e6)).sum
      val want = BigDecimal(micros.toDouble / (per.length * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      out(name) shouldBe ((want, per.length.toLong))
    }
    // every judged query is graded for every run, even the all-miss one
    out("a")._2 shouldBe 3L
    out("b")._2 shouldBe 3L
  }

  test("RRF fusion of two rankers surfacing DISJOINT relevant slices " +
      "outgrades both inputs") {
    // relevant set {1,2,3,4}; lexical surfaces 1,2 then noise, dense
    // surfaces 3,4 then noise — fusion interleaves all four on top
    val lex = ranking((1L, 1L, 1L), (1L, 2L, 2L), (1L, 3L, 101L),
      (1L, 4L, 102L), (1L, 5L, 103L))
    val dense = ranking((1L, 1L, 3L), (1L, 2L, 4L), (1L, 3L, 104L),
      (1L, 4L, 105L), (1L, 5L, 106L))
    val hybrid = RankFusion.rrf(Seq(lex, dense), "doc_id", k = 5)
    val j = judged((1L, 1L, 3L), (1L, 2L, 3L), (1L, 3L, 3L), (1L, 4L, 3L))
    val out = board(
      Seq("lexical" -> lex, "dense" -> dense, "hybrid" -> hybrid),
      j, k = 5)
    out("hybrid")._1 shouldBe 1.0 // all four relevant docs fused on top
    out("hybrid")._1 should be > out("lexical")._1
    out("hybrid")._1 should be > out("dense")._1
    out("lexical")._1 shouldBe out("dense")._1 // symmetric by design
  }

  test("an empty run grades 0 across the judged queries instead of " +
      "vanishing; duplicate ranker names fail loud") {
    val a = ranking((1L, 1L, 5L))
    val none = ranking()
    val j = judged((1L, 5L, 2L), (2L, 6L, 1L))
    val out = board(Seq("a" -> a, "none" -> none), j, k = 3)
    out("none") shouldBe ((0.0, 2L))
    out("a")._2 shouldBe 2L
    intercept[IllegalArgumentException] {
      RankFusion.ndcgLeaderboard(Seq("x" -> a, "x" -> a), j, "doc_id", 3)
    }
  }
}
