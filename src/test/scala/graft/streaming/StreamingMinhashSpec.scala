package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Dedup

/** Cross-run MinHash near-dup in its STREAMING form: foreachBatch hands
  * [[Dedup.incrementalMinhashLsh]] each micro-batch with its epoch id —
  * the deployment shape for continuous crawl ingestion. Pins that the
  * signature history accumulates ACROSS micro-batches (a near-duplicate
  * of a batch-1 doc arriving in batch 2 pairs against the ORIGINAL), and
  * that [[Dedup.compactSignatures]] folds the accumulated epoch dirs
  * without changing a later batch's pairs.
  */
class StreamingMinhashSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("a near-dup arriving in a later micro-batch pairs against history; " +
      "signature compaction preserves pairing") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val table = java.nio.file.Files
      .createTempDirectory("graft-stream-mh").toString + "/sigs"
    val base = (1 to 20).map(i => s"w$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    var perBatch = Vector.empty[Seq[(Long, Long)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        perBatch :+= Dedup.incrementalMinhashLsh(
            b, "doc_id", "text", table, batchId = s"$epoch")
          .orderBy("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      }.start()

    try {
      input.addData(1L -> base) // first sighting: nothing to pair with
      query.processAllAvailable()
      input.addData(
        10L -> base, // exact copy: pairs against the batch-1 original
        11L -> (1 to 20).map(i => s"z$i").mkString(" ")) // novel
      query.processAllAvailable()
    } finally query.stop()

    perBatch shouldBe Vector(Seq.empty, Seq((1L, 10L)))

    // epoch dirs folded into one; a third batch reads the same history
    Dedup.compactSignatures(spark, table) should be >= 1
    new java.io.File(table).listFiles().count(_.getName.startsWith("batch=")) shouldBe 1
    val after = Dedup.incrementalMinhashLsh(
        Seq((20L, base)).toDF("doc_id", "text"), "doc_id", "text",
        table, batchId = "post")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    after shouldBe Set((1L, 20L), (10L, 20L))
  }

  test("the SimHash twin accumulates history across micro-batches the same way") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val table = java.nio.file.Files
      .createTempDirectory("graft-stream-sh").toString + "/fps"
    val base = (1 to 25).map(i => s"tok$i").mkString(" ")

    val input = MemoryStream[(Long, String)]
    var perBatch = Vector.empty[Seq[(Long, Long, Int)]]
    val query = input.toDF().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        perBatch :+= Dedup.incrementalSimhash(
            b, "doc_id", "text", table, batchId = s"$epoch")
          .orderBy("id_a", "id_b")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      }.start()

    try {
      input.addData(1L -> base)
      query.processAllAvailable()
      input.addData(10L -> base) // exact copy: hamming 0 vs history
      query.processAllAvailable()
    } finally query.stop()

    perBatch shouldBe Vector(Seq.empty, Seq((1L, 10L, 0)))
  }
}
