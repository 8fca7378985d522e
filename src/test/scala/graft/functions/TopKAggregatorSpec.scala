package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bounded top-k aggregator: equality with the row_number window idiom on
  * arbitrary inputs (including score ties), merge-order invariance via
  * repartitioning, and the k bound.
  */
class TopKAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def viaAggregator(rows: Seq[(String, Double, Long)], k: Int,
      parts: Int): Map[String, Seq[Long]] = {
    import spark.implicits._
    val topk = udaf(new TopKAggregator(k))
    rows.toDF("g", "score", "id").repartition(parts)
      .groupBy(col("g")).agg(topk(col("score"), col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  private def viaWindow(rows: Seq[(String, Double, Long)], k: Int): Map[String, Seq[Long]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.sortBy(r => (-r._2, r._3)).take(k).map(_._3)
    }

  test("matches the window idiom on arbitrary inputs, any partitioning") {
    val rowsGen = Gen.choose(1, 80).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      score <- Gen.oneOf(Gen.chooseNum(-5.0, 5.0), Gen.oneOf(1.0, 2.0)) // ties likely
      id <- Gen.choose(0L, 500L)
    } yield (g, score, id)).map(_.distinctBy(_._3)))
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 13)) { (rows, parts) =>
      viaAggregator(rows, k = 3, parts) == viaWindow(rows, k = 3)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("groups smaller than k return all their ids, ranked") {
    val out = viaAggregator(Seq(("a", 1.0, 1L), ("a", 3.0, 2L)), k = 5, parts = 2)
    out("a") shouldBe Seq(2L, 1L)
  }

  test("ties break by ascending id (deterministic, oracle-replayable)") {
    val out = viaAggregator(
      Seq(("a", 2.0, 9L), ("a", 2.0, 3L), ("a", 2.0, 7L)), k = 2, parts = 3)
    out("a") shouldBe Seq(3L, 7L)
  }

  test("NaN scores rank deterministically (total order: NaN largest)") {
    // NaN fails both > and == — a naive comparator would make the result
    // arrival-order-dependent and let a NaN buffer tail block better
    // rows. Double.compare total-orders NaN above everything, matching
    // Spark's sort, so the result is the same under every partitioning.
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("a", Double.NaN, 3L),
      ("a", 9.0, 4L))
    (1 to 4).foreach { parts =>
      viaAggregator(rows, k = 2, parts)("a") shouldBe Seq(3L, 4L)
    }
  }
}
