package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.core.Tables

/** Bucketing = the pay-once shuffle: after writing orders and lineitem
  * bucketed by the join key, the join plans with ZERO shuffle exchanges —
  * the co-location survives in the table metadata and every downstream
  * join reuses it. The same join over plain parquet needs two exchanges.
  */
class BucketedJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("bucketed orders-lineitem join plans without shuffle exchanges") {
    // broadcast would bypass the shuffle question entirely on tiny inputs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val lineitem = Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))

      // plain parquet twin: the join must shuffle both sides
      val plain = orders.join(lineitem, "o_orderkey")
      Bucketing.shuffleExchangeCount(plain) should be >= 2

      Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
      Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)
      val bucketed = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      Bucketing.shuffleExchangeCount(bucketed) shouldBe 0

      // same rows either way
      bucketed.count() shouldBe plain.count()
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
