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
}
