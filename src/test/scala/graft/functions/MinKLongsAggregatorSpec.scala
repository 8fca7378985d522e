package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bounded min-k long aggregator (the [[TopKAggregator]] machinery
  * specialized to primitive unscored ids, the domain-cap gate's kernel):
  * equality with sorted-take on arbitrary inputs under any partitioning,
  * the k bound, and the TopKAggregator(constant score) equivalence the
  * round-10 domainGate swap relies on.
  */
class MinKLongsAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def viaAggregator(rows: Seq[(String, Long)], k: Int,
      parts: Int): Map[String, Seq[Long]] = {
    import spark.implicits._
    val mink = udaf(new MinKLongsAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    rows.toDF("g", "id").repartition(parts)
      .groupBy(col("g")).agg(mink(col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
  }

  test("matches sorted-take on arbitrary inputs, any partitioning") {
    val rowsGen = Gen.choose(1, 90).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      id <- Gen.choose(-100L, 500L)
    } yield (g, id)).map(_.distinct))
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 13), Gen.choose(1, 7)) {
      (rows, parts, k) =>
        val expected = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(_._2).sorted.take(k)
        }
        viaAggregator(rows, k, parts) == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("groups smaller than k return all ids ascending; k bounds the rest") {
    val out = viaAggregator(
      Seq(("a", 9L), ("a", 1L), ("a", 5L), ("b", 2L)), k = 2, parts = 3)
    out("a") shouldBe Seq(1L, 5L)
    out("b") shouldBe Seq(2L)
  }

  test("equivalent to TopKAggregator with a constant score") {
    import spark.implicits._
    val rows = (1 to 60).map(i => (s"g${i % 4}", (i * 37 % 100).toLong))
      .distinct
    val topk = udaf(new TopKAggregator(3))
    val viaScored = rows.toDF("g", "id").repartition(5)
      .groupBy(col("g")).agg(topk(lit(0.0), col("id")).as("ids"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    viaAggregator(rows, k = 3, parts = 5) shouldBe viaScored
  }
}
