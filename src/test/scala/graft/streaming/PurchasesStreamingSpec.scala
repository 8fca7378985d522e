package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.serving.Serving

/** The purchases topology scenario the reference's E2E tier *intended* to
  * cover (SURVEY §5 notes `PurchasesServiceTests.java` drives the wrong
  * topic — the bug is not replicated here): JSON purchase records in,
  * continuously updated `{customer-product: {count, total}}` out
  * (reference: `streams/PurchasesTopology.java:49-73`).
  */
class PurchasesStreamingSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("purchases upsert {count,total} per composite key across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[String]
    val aggregated = Topologies.purchases(
      Topologies.parsePurchases(input.toDF()))

    val serving = new Serving
    val query = serving.maintain(aggregated, "purchases", "k", checkpoint())
    val store = serving.table("purchases").get

    try {
      input.addData(
        """{"customerId":7,"productId":101,"quantity":2}""",
        """{"customerId":7,"productId":101,"quantity":3}""",
        """{"customerId":7,"productId":202,"quantity":1}""",
        """{"customerId":9,"productId":101,"quantity":5}""")
      query.processAllAvailable()

      store.get("7-101").get shouldBe Map("count" -> 2L, "total" -> 5.0)
      store.get("7-202").get shouldBe Map("count" -> 1L, "total" -> 1.0)
      store.get("9-101").get shouldBe Map("count" -> 1L, "total" -> 5.0)

      // second wave updates an existing key in place (upsert, not append)
      input.addData("""{"customerId":7,"productId":101,"quantity":10}""")
      query.processAllAvailable()
      store.get("7-101").get shouldBe Map("count" -> 3L, "total" -> 15.0)
      store.size shouldBe 3

      // prefix scan: customer 7's products only, sorted by composite key
      store.prefix("7-").map(_._1) shouldBe Seq("7-101", "7-202")
    } finally query.stop()
  }
}
