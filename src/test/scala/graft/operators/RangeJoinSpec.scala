package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The bucketized range join must be EXACTLY the theta join, for any
  * bucket width — `step` is a cost dial, never a semantics dial.
  */
class RangeJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def thetaPairs(anchors: Seq[(Long, Double)], members: Seq[(Long, Double)],
      band: Double): Set[(Long, Long)] =
    (for {
      (aid, av) <- anchors
      (mid, mv) <- members
      if mv >= av - band && mv <= av + band
    } yield (aid, mid)).toSet

  private def bucketized(anchors: Seq[(Long, Double)], members: Seq[(Long, Double)],
      band: Double, step: Double): Set[(Long, Long)] = {
    import spark.implicits._
    RangeJoin.bandJoin(
      anchors.toDF("id", "v"), members.toDF("id", "v"),
      "v", "id", "id", band, step)
      .as[(Long, Long)].collect().toSet
  }

  test("band join equals the naive theta join across step choices") {
    val rnd = new scala.util.Random(42)
    val anchors = (0L until 30L).map(i => i -> (rnd.nextDouble() * 100))
    val members = (100L until 300L).map(i => i -> (rnd.nextDouble() * 100))
    val expected = thetaPairs(anchors, members, band = 3.0)
    expected should not be empty
    for (step <- Seq(0.5, 3.0, 50.0))
      bucketized(anchors, members, band = 3.0, step) shouldBe expected
  }

  test("property: equivalence on random inputs incl. negatives and ties") {
    val valGen = Gen.chooseNum(-50.0, 50.0)
    val rowsGen = Gen.listOfN(40, valGen)
    val prop = Prop.forAll(rowsGen, rowsGen, Gen.oneOf(0.25, 1.0, 7.0)) {
      (as, ms, step) =>
        val anchors = as.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val members = ms.zipWithIndex.map { case (v, i) => (1000L + i, v) }
        bucketized(anchors, members, band = 2.0, step) ==
          thetaPairs(anchors, members, band = 2.0)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    withClue(res.status.toString)(res.passed shouldBe true)
  }

  test("plans an equi-join on the bucket, not a nested-loop/cartesian join") {
    import spark.implicits._
    val df = RangeJoin.bandJoin(
      Seq((1L, 1.0)).toDF("id", "v"), Seq((2L, 1.5)).toDF("id", "v"),
      "v", "id", "id", band = 2.0, step = 2.0)
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("interval overlap equals the theta join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val as = (0L until 60L).map { i =>
      val lo = rnd.nextDouble() * 100; (i, lo, lo + rnd.nextDouble() * 10)
    }
    val bs = (1000L until 1080L).map { i =>
      val lo = rnd.nextDouble() * 100; (i, lo, lo + rnd.nextDouble() * 10)
    }
    val expected = (for {
      (ai, alo, ahi) <- as; (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    expected should not be empty
    for (step <- Seq(1.0, 8.0, 64.0)) {
      val out = RangeJoin.intervalOverlap(
        as.toDF("aid", "alo", "ahi"), "alo", "ahi",
        bs.toDF("bid", "blo", "bhi"), "blo", "bhi", step)
        .select("aid", "bid").as[(Long, Long)].collect()
      out.length shouldBe out.toSet.size // exactly-once: no bucket dups
      out.toSet shouldBe expected
    }
  }

  test("points exactly on interval endpoints are included (inclusive bounds)") {
    import spark.implicits._
    val out = RangeJoin.pointInInterval(
      Seq((1L, 10.0), (2L, 20.0), (3L, 10.5)).toDF("pid", "v"), "v",
      Seq((7L, 10.0, 20.0)).toDF("iid", "lo", "hi"), "lo", "hi",
      step = 4.0)
      .select("pid").as[Long].collect().toSet
    out shouldBe Set(1L, 2L, 3L)
  }
}
