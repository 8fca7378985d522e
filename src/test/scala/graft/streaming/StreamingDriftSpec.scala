package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Drift

/** Drift monitoring in its STREAMING form: each micro-batch is compared
  * against a fixed reference slice via foreachBatch — the deployment
  * shape of a pre-mix monitor (score the arriving crawl batch, alert
  * before it enters the mix). Per-batch results must equal the same
  * operator run on the same rows as a static frame: foreachBatch hands
  * the operator a plain DataFrame, so this pins that neither operator
  * depends on anything a micro-batch lacks.
  */
class StreamingDriftSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("per-batch token JSD against a fixed reference matches batch runs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val reference = Seq((0L, "the plan scans and filters rows"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    var perBatch = Vector.empty[Seq[(String, Double)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, _: Long) =>
        perBatch :+= Drift.tokenJsd(b, reference, "text", topK = 5)
          .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
      }.start()

    val batch1 = Seq(1L -> "the plan scans and filters rows")
    val batch2 = Seq(2L -> "zq xv unrelated drifted tokens here")
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()

    def static(rows: Seq[(Long, String)]) =
      Drift.tokenJsd(rows.toDF("doc_id", "text"), reference, "text", topK = 5)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toSeq
    perBatch shouldBe Vector(static(batch1), static(batch2))
    perBatch(0).foreach(_._2 shouldBe 0.0) // identical batch: zero drift
    perBatch(1).map(_._2).foreach(_ should be > 0.0) // drifted batch
  }

  test("per-batch centroid cosine against a fixed reference matches batch runs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val reference = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 2f)))
      .toDF("vec_id", "embedding")
    val input = MemoryStream[(Long, Seq[Float])]
    var perBatch = Vector.empty[(Long, Long, Double)]
    val query = input.toDF().toDF("vec_id", "embedding").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = Drift.embeddingCentroidCos(b, reference, "embedding")
          .collect().head
        perBatch :+= ((r.getLong(0), r.getLong(1), r.getDouble(2)))
      }.start()

    try {
      input.addData(10L -> Seq(2f, 2f)) // same direction as ref centroid (1,1)
      query.processAllAvailable()
      input.addData(11L -> Seq(-1f, -1f)) // opposite
      query.processAllAvailable()
    } finally query.stop()

    perBatch shouldBe Vector((1L, 2L, 1.0), (1L, 2L, -1.0))
  }
}
