package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Driver-contract invariants for [[SparkEntry]]. */
class SparkEntrySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("entry (flagship) returns rows on the smoke fixture") {
    val df = SparkEntry.entry(spark)
    df.count() should be > 0L
  }

  test("every oracle key names a declared query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    os -- qs shouldBe empty // an orphan oracle would silently never run
    all(qs.toSeq) should fullyMatch regex "q\\d+_[a-z0-9_]+"
    // every declared query must have a DuckDB oracle (q39 gained its
    // byte-fold/BMP-header oracle in round 6, closing the last carve-out)
    (qs -- os) shouldBe empty
  }

  test("oracle SQL is syntactically loadable (no stray quotes breaking the dump)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      sql should not include "\"\"\""
      sql.trim should not be empty
    }
  }

  test("bench JSON line fits the driver's stdout tail capture") {
    // The driver keeps only the last ~2000 bytes of Bench output (plus
    // sbt's trailing "[success]" line inside the same window); round 3's
    // 2060-byte line arrived truncated and was recorded unparsed. This
    // pins the HARD byte budget only: jsonLine degrades precision
    // 3->2->1->0 decimals by design as the battery grows, so the test
    // fails only when even whole-second rendering cannot fit — the point
    // where query names themselves must shrink.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 88.888)
    val line = Bench.jsonLine(worst, "/root/testdata/sf0.1")
    line.length should be <= 1910
    line should startWith("{\"metric\":\"total\"")
    line should endWith("}")
    // a realistic full-battery result must keep sub-second resolution —
    // past 84 queries full names no longer fit at 0.1 s, so the keys
    // degrade to their unique qNN ordinals BEFORE the values lose
    // precision (BASELINE.md documents the prefix mapping)
    val realistic = SparkEntry.queries.keys.toSeq.sorted.map(_ -> 0.488)
    val rLine = Bench.jsonLine(realistic, "/root/testdata/sf0.1")
    rLine should include(":0.488") // millisecond resolution survives
    rLine.length should be <= 1910
    // the shortened keys stay unique and keep their ordinal
    val prefixes = SparkEntry.queries.keys.toSeq.map(_.takeWhile(_ != '_'))
    prefixes.distinct.size shouldBe prefixes.size
    rLine should include("\"q85\":")
  }
}
