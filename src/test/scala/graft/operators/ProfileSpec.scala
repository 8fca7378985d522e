package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Column profiling: exact cell values on a known fixture (nulls,
  * distincts, string-rendered min/max), the approx variant's tolerance,
  * and input validation.
  */
class ProfileSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, Some("a"), 10),
      (2L, None, 20),
      (3L, Some("b"), 20),
      (4L, Some("a"), 30)
    ).toDF("id", "tag", "score")
  }

  test("exact profile cells on a known fixture") {
    val rows = Profile.profile(fixture, Seq("id", "tag", "score"))
      .orderBy(col("col_name")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    rows shouldBe Array(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("score", 4L, 0L, 3L, "10", "30"),
      ("tag", 4L, 1L, 2L, "a", "b"))
  }

  test("approx variant tracks exact distincts on real data") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val cols = Seq("doc_id", "lang", "source")
    def distincts(approx: Boolean) =
      Profile.profile(docs, cols, approxDistinct = approx)
        .orderBy(col("col_name")).collect()
        .map(r => r.getString(0) -> r.getLong(3)).toMap
    val exact = distincts(false)
    val approx = distincts(true)
    cols.foreach { c =>
      approx(c).toDouble shouldBe (exact(c).toDouble +- (exact(c) * 0.05 + 1))
    }
  }

  test("empty input profiles to zero counts, not NULLs") {
    val rows = Profile.profile(fixture.where(lit(false)), Seq("tag"))
      .collect()
    rows should have length 1
    val r = rows.head
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) shouldBe
      ("tag", 0L, 0L, 0L)
    r.isNullAt(4) shouldBe true // no min/max on zero rows
  }

  test("column names that are not bare identifiers survive the unpivot") {
    val df = fixture.withColumnRenamed("tag", "tag-v2")
      .withColumnRenamed("score", "the.score")
    val rows = Profile.profile(df, Seq("tag-v2", "the.score"))
      .orderBy(col("col_name")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    rows shouldBe Array(("tag-v2", 1L, 2L), ("the.score", 0L, 3L))
  }

  test("unknown and empty column lists are rejected") {
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(fixture, Seq("nope"))
    an[IllegalArgumentException] should be thrownBy
      Profile.profile(fixture, Nil)
  }

  test("group quantile floor keeps each group's own upper tail") {
    import spark.implicits._
    // group a: values 1..4, p50 (interpolated) = 2.5 -> keep {3,4}
    // group b: values 10..12, p50 = 11 -> keep {11,12} (>= keeps the
    // threshold point itself when it IS a data value)
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 11.0), ("b", 12.0)
    ).toDF("g", "v")
    val kept = Profile.groupQuantileFloor(df, "g", "v", 0.5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    kept shouldBe Set(("a", 3.0), ("a", 4.0), ("b", 11.0), ("b", 12.0))
  }

  test("approx quantile floor tracks the exact one on real data") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"), col("n_chars").cast("double").as("v"))
    def keptIds(f: (org.apache.spark.sql.DataFrame, String, String, Double)
        => org.apache.spark.sql.DataFrame) =
      f(docs, "lang", "v", 0.25).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val exact = keptIds(Profile.groupQuantileFloor)
    val approx = keptIds(Profile.groupQuantileFloorApprox)
    exact should not be empty
    // sketch threshold may admit/drop a boundary sliver, never much more
    val sym = (exact diff approx) ++ (approx diff exact)
    sym.size.toDouble should be <= (exact.size * 0.05 + 1)
  }
}
