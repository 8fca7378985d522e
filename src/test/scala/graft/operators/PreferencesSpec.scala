package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Preference pairs: gap gate, per-prompt cap with deterministic
  * selection order, tie handling, and validation.
  */
class PreferencesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def scored(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("q", "cand", "s")
  }

  private def pairs(minGap: Long, maxPairs: Int,
      rows: (Long, Long, Long)*) =
    Preferences.preferencePairs(scored(rows: _*), "q", "cand", "s",
        minGap, maxPairs)
      .orderBy(col("query_id"), col("pair_no")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))

  test("largest gaps first, capped per prompt, 1-based pair_no") {
    // scores: a=100, b=60, c=10 -> gaps: (a,c)=90, (b,c)=50, (a,b)=40
    val out = pairs(30L, 2,
      (1L, 10L, 100L), (1L, 11L, 60L), (1L, 12L, 10L))
    out shouldBe Array(
      (1L, 1L, 10L, 12L, 90L),
      (1L, 2L, 11L, 12L, 50L))
  }

  test("the gap gate drops near-ties; equal scores never pair; a " +
      "prompt with no qualifying pair emits nothing") {
    pairs(50L, 5, (1L, 10L, 100L), (1L, 11L, 60L)) shouldBe empty
    pairs(1L, 5, (2L, 20L, 70L), (2L, 21L, 70L)) shouldBe empty
  }

  test("equal gaps select deterministically (chosen asc, rejected asc)" +
      " and prompts stay independent") {
    // two 40-gaps in prompt 1: (10,12) and (11,13); cap 1 picks (10,12)
    val out = pairs(40L, 1,
      (1L, 10L, 100L), (1L, 11L, 100L), (1L, 12L, 60L), (1L, 13L, 60L),
      (2L, 20L, 90L), (2L, 21L, 10L))
    out shouldBe Array(
      (1L, 1L, 10L, 12L, 40L),
      (2L, 1L, 20L, 21L, 80L))
  }

  test("zero/negative knobs fail loud") {
    an[IllegalArgumentException] should be thrownBy
      Preferences.preferencePairs(scored((1L, 1L, 1L)), "q", "cand",
        "s", 0L, 3)
    an[IllegalArgumentException] should be thrownBy
      Preferences.preferencePairs(scored((1L, 1L, 1L)), "q", "cand",
        "s", 5L, 0)
  }

  test("best-of-N keeps each prompt's argmax, ties to the smallest " +
      "candidate id, weak winners dropped by minScore") {
    def best(minScore: Long, rows: (Long, Long, Long)*) =
      Preferences.bestOfN(scored(rows: _*), "q", "cand", "s", minScore)
        .orderBy(col("query_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // prompt 1: clear winner; prompt 2: tied top -> smallest cand;
    // prompt 3: best below the floor -> the whole prompt drops
    best(50L,
      (1L, 10L, 40L), (1L, 11L, 90L), (1L, 12L, 70L),
      (2L, 20L, 80L), (2L, 21L, 80L), (2L, 19L, 10L),
      (3L, 30L, 49L), (3L, 31L, 20L)) shouldBe
      Seq((1L, 11L, 90L, 3L), (2L, 20L, 80L, 3L))
    // default floor keeps everything, including negative scores
    best(Long.MinValue, (7L, 70L, -5L), (7L, 71L, -9L)) shouldBe
      Seq((7L, 70L, -5L, 2L))
    // partitioning-invariant (one hash aggregate, no window)
    val df = scored((1L to 500L).map(i => (i % 20, i, i * 7 % 101)): _*)
    val a = Preferences.bestOfN(df, "q", "cand", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    Preferences.bestOfN(df.repartition(9), "q", "cand", "s").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap shouldBe a
  }

  test("bestWorstPairs: one (argmax, argmin) pair per prompt, ties to " +
      "the smallest id on both sides, gap-gated, single-candidate " +
      "prompts drop") {
    def bw(minGap: Long, rows: (Long, Long, Long)*) =
      Preferences.bestWorstPairs(scored(rows: _*), "q", "cand", "s",
          minGap)
        .orderBy(col("query_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
    // prompt 1: tied best -> cand 2, tied worst -> cand 4, gap 35;
    // prompt 2: single candidate -> gap 0 drops; prompt 3: gap 2 < 5
    bw(5L,
      (1L, 1L, 10L), (1L, 2L, 40L), (1L, 3L, 40L), (1L, 4L, 5L),
      (1L, 5L, 5L),
      (2L, 1L, 7L),
      (3L, 1L, 100L), (3L, 2L, 98L)) shouldBe
      Seq((1L, 2L, 4L, 35L, 5L))
    an[IllegalArgumentException] should be thrownBy
      Preferences.bestWorstPairs(scored((1L, 1L, 1L)), "q", "cand",
        "s", 0L)
    // partitioning-invariant (one hash aggregate, like bestOfN)
    val df = scored((1L to 500L).map(i => (i % 20, i, i * 7 % 101)): _*)
    val a = Preferences.bestWorstPairs(df, "q", "cand", "s", 3L)
      .collect().map(_.toSeq).toSet
    Preferences.bestWorstPairs(df.repartition(9), "q", "cand", "s", 3L)
      .collect().map(_.toSeq).toSet shouldBe a
  }
}
