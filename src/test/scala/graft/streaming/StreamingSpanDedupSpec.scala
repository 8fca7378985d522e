package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Dedup

/** Cross-run duplicate-span detection in its STREAMING form: foreachBatch
  * hands [[Dedup.incrementalDuplicateSpans]] each micro-batch with its
  * epoch id — the deployment shape for continuous crawl ingestion. Pins
  * that history accumulates ACROSS micro-batches: a boilerplate block seen
  * once in batch 1 and once in batch 2 flags in batch 2 even though each
  * batch alone holds it once.
  */
class StreamingSpanDedupSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("a block recurring across micro-batches flags on its second arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val table = java.nio.file.Files
      .createTempDirectory("graft-stream-spans").toString + "/counts"
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel"
    def uniq(tag: String) = (1 to 12).map(i => s"$tag$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    var perBatch = Vector.empty[Seq[(Long, Long, Long)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        perBatch :+= Dedup.incrementalDuplicateSpans(
            b, "doc_id", "text", table, k = 8, batchId = s"$epoch")
          .orderBy("doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      }.start()

    try {
      input.addData(1L -> s"$boiler ${uniq("u")}") // first sighting: clean
      query.processAllAvailable()
      input.addData(
        10L -> s"${uniq("v")} $boiler", // recurrence: flags via history
        11L -> uniq("w")) // truly novel: clean
      query.processAllAvailable()
    } finally query.stop()

    perBatch shouldBe Vector(Seq.empty, Seq((10L, 1L, 8L)))
  }
}
