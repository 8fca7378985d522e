package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Dedup

/** Cross-run SEMANTIC dedup in its streaming form — completes the
  * streaming-twin family (exact / MinHash / SimHash have one; this is
  * the embedding-cluster member): foreachBatch hands
  * [[Dedup.incrementalSemanticDedup]] each micro-batch with its epoch id
  * and folds the embedding history with [[Dedup.compactEmbeddings]]
  * inside the loop. Pins that per-micro-batch survivors equal the batch
  * operator's over the same epochs, that a cross-batch near-dup of a
  * streamed survivor drops, and that in-loop compaction never changes a
  * later batch's answer.
  */
class StreamingSemanticSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("per-micro-batch survivors equal the batch operator over the same " +
      "epochs; in-loop history compaction preserves them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val base = java.nio.file.Files
      .createTempDirectory("graft-stream-sem").toString
    val table = base + "/emb"

    val e0 = Seq( // three mutually-distant vectors (two blocks)
      (1L, 7, Seq(1f, 0f, 0f, 0f)),
      (2L, 7, Seq(0f, 1f, 0f, 0f)),
      (3L, 8, Seq(0f, 0f, 1f, 0f)))
    val e1 = Seq(
      (10L, 7, Seq(2f, 0f, 0f, 0f)), // same direction as streamed doc 1
      (11L, 7, Seq(0.6f, 0.8f, 0f, 0f)), // novel
      (12L, 7, Seq(0.6f, 0.8f, 0.01f, 0f))) // in-batch near-dup of 11
    val e2 = Seq((20L, 7, Seq(1f, 0f, 0f, 0f))) // dup of 1, post-compaction

    val input = MemoryStream[(Long, Int, Seq[Float])]
    var perBatch = Vector.empty[Set[Long]]
    val query = input.toDF().toDF("vec_id", "label", "embedding").writeStream
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        perBatch :+= Dedup.incrementalSemanticDedup(
            b, "vec_id", "embedding", "label", 0.9, table,
            batchId = s"$epoch")
          .select("vec_id").collect().map(_.getLong(0)).toSet
        // the maintenance a production loop runs between ingests: fold
        // epoch dirs (the in-flight batch already finished its write)
        Dedup.compactEmbeddings(spark, table): Unit
      }.start()

    try {
      input.addData(e0: _*)
      query.processAllAvailable()
      input.addData(e1: _*)
      query.processAllAvailable()
      input.addData(e2: _*)
      query.processAllAvailable()
    } finally query.stop()

    // 10 drops against HISTORY doc 1 (cross-batch, same direction); 12
    // drops against 11 in-batch; 20 drops against the COMPACTED history
    perBatch shouldBe Vector(Set(1L, 2L, 3L), Set(11L), Set.empty[Long])
    new java.io.File(table).listFiles()
      .count(_.getName.startsWith("batch=")) shouldBe 1

    // twin equality: the batch operator over the same epochs, fresh table
    val table2 = base + "/emb2"
    val manual = Seq(e0, e1, e2).zipWithIndex.map { case (rows, i) =>
      Dedup.incrementalSemanticDedup(
          rows.toDF("vec_id", "label", "embedding"),
          "vec_id", "embedding", "label", 0.9, table2, batchId = s"$i")
        .select("vec_id").collect().map(_.getLong(0)).toSet
    }
    manual shouldBe perBatch.toSeq
  }
}
