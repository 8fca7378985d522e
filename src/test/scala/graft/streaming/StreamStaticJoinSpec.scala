package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Stream-static dimension enrichment: a purchase stream joined to a
  * static dimension table. The static side is planned per micro-batch (a
  * broadcast hash join — no streaming state at all, unlike stream-stream),
  * and re-reading it each batch is what makes slowly-changing files pick
  * up updates without restarting the query.
  */
class StreamStaticJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("stream enriches against a static dimension; unmatched keys dead-letter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dim = Seq((1, "books"), (2, "games")).toDF("product_id", "category")

    val purchases = MemoryStream[(Int, Int)] // (product_id, quantity)
    val enriched = purchases.toDF().toDF("product_id", "quantity")
      .join(broadcast(dim), Seq("product_id"), "left")

    var rows = Vector.empty[(Int, Int, Option[String])]
    val q = enriched.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        rows ++= b.collect().map(r =>
          (r.getInt(0), r.getInt(1), Option(r.getString(2))))
      }.start()

    try {
      purchases.addData((1, 3), (2, 1), (9, 5)) // 9: unknown product
      q.processAllAvailable()
    } finally q.stop()

    rows.toSet shouldBe Set(
      (1, 3, Some("books")), (2, 1, Some("games")), (9, 5, None))
    // left join keeps the unmatched row (dead-letterable downstream)
    rows.count(_._3.isEmpty) shouldBe 1
  }
}
