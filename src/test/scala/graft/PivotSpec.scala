package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** q58's cross-engine hazard, pinned: Spark pivots an EMPTY cell to NULL
  * while the oracle's conditional-count twin yields 0 — the battery query
  * fills to 0, and this spec proves the fill on a fixture engineered to
  * have an empty cell (the parquet fixture happens to populate every cell,
  * so only a synthetic frame can exercise the divergence).
  */
class PivotSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("empty pivot cells surface as 0, not NULL (oracle semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // flag 'A' has no 'O' rows — that cell is empty
    val df = Seq(("A", "F"), ("A", "F"), ("N", "F"), ("N", "O")).toDF("flag", "status")
    val piv = df.groupBy(col("flag")).pivot("status", Seq("F", "O"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O"))
      .orderBy(col("flag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    piv shouldBe Seq(("A", 2L, 0L), ("N", 1L, 1L))
  }
}
