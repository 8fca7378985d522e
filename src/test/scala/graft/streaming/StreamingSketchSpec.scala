package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Sketches

/** Incremental sketch ingestion: each micro-batch appends per-grain HLL
  * sketch rows; the query-time rollup unions sketch rows across batches.
  * Mergeability means the batched path must estimate like a single global
  * sketch — no raw keys are retained between batches.
  */
class StreamingSketchSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("per-batch sketch appends roll up across batches to exact-tracking counts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-sketch-").toString + "/sk"
    val in = MemoryStream[(String, Long)] // (event_type, user_id)

    val q = in.toDF().toDF("event_type", "user_id")
      .writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.hllSketchTable(b, "user_id", lgK = 14, "event_type")
          .write.mode("append").parquet(dir)
      }.start()

    try {
      // overlapping user sets across batches: union must dedupe them
      in.addData((1L to 300L).map(u => ("click", u)): _*)
      q.processAllAvailable()
      in.addData((200L to 500L).map(u => ("click", u)): _*)
      in.addData((1L to 50L).map(u => ("buy", u)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val rolled = Sketches.hllRollup(spark.read.parquet(dir), "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact distincts: click 1..500 (overlap collapsed), buy 1..50
    rolled("click").toDouble should be(500.0 +- 25.0)
    rolled("buy").toDouble should be(50.0 +- 3.0)
    // and rows (exact counts) survive: 300 + 301 click rows, 50 buy rows
    val rows = Sketches.hllRollup(spark.read.parquet(dir), "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    rows("click") shouldBe 601L
    rows("buy") shouldBe 50L
  }
}
