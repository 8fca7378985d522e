package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bounded top-k SCORED aggregator (the margin miner's neighborhood
  * fold — scores travel with the ids): equality with the
  * sort-everything idiom on arbitrary inputs including ties,
  * merge-order invariance via repartitioning, and the k bound.
  */
class TopKScoredAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def viaAggregator(rows: Seq[(String, Long, Long)], k: Int,
      parts: Int): Map[String, Seq[(Long, Long)]] = {
    import spark.implicits._
    val topk = udaf(new TopKScoredAggregator(k))
    rows.toDF("g", "micros", "id").repartition(parts)
      .groupBy(col("g")).agg(topk(col("micros"), col("id")).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getLong(1))).toSeq)
      .toMap
  }

  private def viaSort(rows: Seq[(String, Long, Long)],
      k: Int): Map[String, Seq[(Long, Long)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct
        .sortBy(r => (-r._1, r._2)).take(k)
    }

  test("matches the sort-everything idiom on arbitrary inputs, any " +
      "partitioning (micros DESC, id ASC), scores attached") {
    val rowsGen = Gen.choose(1, 80).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      micros <- Gen.oneOf(Gen.choose(-50L, 50L), Gen.oneOf(1L, 2L))
      id <- Gen.choose(0L, 40L)
    } yield (g, micros, id)).map(_.distinctBy(r => (r._1, r._3))))
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 13)) { (rows, parts) =>
      viaAggregator(rows, k = 3, parts) == viaSort(rows, k = 3)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("groups smaller than k return all their pairs ranked; ties " +
      "break to the ascending id under any partitioning") {
    viaAggregator(Seq(("a", 10L, 1L), ("a", 30L, 2L)),
      k = 5, parts = 2)("a") shouldBe Seq((30L, 2L), (10L, 1L))
    val tied = Seq(("a", 7L, 9L), ("a", 7L, 3L), ("a", 7L, 7L))
    (1 to 4).foreach { parts =>
      viaAggregator(tied, k = 2, parts)("a") shouldBe
        Seq((7L, 3L), (7L, 7L))
    }
  }

  test("the buffer never exceeds k entries while reducing a stream") {
    val agg = new TopKScoredAggregator(4)
    var buf = agg.zero
    (1 to 5000).foreach { i =>
      buf = agg.reduce(buf, (i.toLong % 997, i.toLong))
      buf.size should be <= 4
    }
    buf.map(_._1) shouldBe buf.map(_._1).sorted(Ordering[Long].reverse)
  }
}
