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
    // rows-only queries are the two documented ones
    // q39 is the single legitimately oracle-less query (its decode fields
    // come from the documented multimodal stub); everything else must pair
    (qs -- os) shouldBe Set("q39_multimodal_decode")
  }

  test("oracle SQL is syntactically loadable (no stray quotes breaking the dump)") {
    SparkEntry.oracleSql.values.foreach { sql =>
      sql should not include "\"\"\""
      sql.trim should not be empty
    }
  }
}
