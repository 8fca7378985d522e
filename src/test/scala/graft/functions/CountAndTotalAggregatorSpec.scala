package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property: the typed [[CountAndTotalAggregator]] (the reference's custom
  * aggregate surface, `streams/PurchasesTopology.java:61-66,75-80`) is
  * semantically identical to the built-in `count + sum` plan on arbitrary
  * keyed purchase sets — the same invariant the oracle enforces between
  * q25 (UDAF) and q08 (built-in) at fixture scale, here on random data.
  */
class CountAndTotalAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val purchases: Gen[List[(String, Double)]] = Gen.listOf(
    for {
      key <- Gen.oneOf("a-1", "a-2", "b-1", "c-9")
      qty <- Gen.chooseNum(0.0, 1000.0)
    } yield (key, math.round(qty * 100) / 100.0))

  test("Aggregator[Double] == built-in count+sum on random purchase sets") {
    import spark.implicits._
    val cta = udaf(new CountAndTotalAggregator)

    val prop = Prop.forAll(purchases) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "quantity")

        val viaAggregator = df.groupBy("k").agg(cta(col("quantity")).as("ct"))
          .select(col("k"), col("ct.count").as("cnt"), col("ct.total").as("total"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

        val viaBuiltin = df.groupBy("k").agg(
            count(lit(1)).as("cnt"),
            sum(col("quantity").cast("decimal(38,9)")).cast("double").as("total"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

        viaAggregator == viaBuiltin
      }
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("merge is order-insensitive: repartitioned input gives identical totals") {
    import spark.implicits._
    val cta = udaf(new CountAndTotalAggregator)
    val rows = (1 to 500).map(i => ("k-" + (i % 7), i * 0.01 + 0.001))
    def run(parts: Int) =
      rows.toDF("k", "quantity").repartition(parts)
        .groupBy("k").agg(cta(col("quantity")).as("ct"))
        .select(col("k"), col("ct.total")).collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
    run(1) shouldBe run(13)
  }
}
