package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming maintenance of the bucket-partitioned ANN index: the SAME
  * posting projection used by the batch index build runs on a streaming
  * source and appends into the (table, bucket)-partitioned parquet index
  * via the file sink — so new vectors become queryable (with the SAME
  * pruned-scan query path) as micro-batches land, with exactly-once file
  * sink semantics from the checkpoint. This is the streaming half of the
  * 100 TB ANN story: the index is a live table, not a rebuild artifact.
  */
class StreamingLshIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dim = 8

  /** Deterministic unit-ish vector for id: basis direction id%dim plus a
    * small id-dependent off-axis component.
    */
  private def vec(id: Long): Array[Double] = {
    val v = new Array[Double](dim)
    v((id % dim).toInt) = 1.0
    v(((id + 3) % dim).toInt) += 0.1 * ((id % 5) + 1)
    v
  }

  test("streamed vectors land in the partitioned index and are found by pruned queries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-index-").toString
    val input = MemoryStream[(Long, Array[Double])]
    val postings = Similarity.lshPostings(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", dim = dim)

    val query = postings.writeStream
      .format("parquet")
      .option("path", dir)
      .option("checkpointLocation", checkpoint())
      .partitionBy("table", "bucket")
      .outputMode("append")
      .start()
    try {
      input.addData((1L to 20L).map(id => (id, vec(id))): _*)
      query.processAllAvailable()

      // batch 1 visible: querying with vector 5's direction finds id 5 first
      val r1 = Similarity.lshTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(5L), queryId = -1L, k = 3).collect()
      r1.head.getLong(0) shouldBe 5L
      r1.head.getDouble(1) shouldBe 1.0 +- 1e-9

      // batch 2 appends; an identical new vector becomes the top hit
      input.addData((100L, vec(5L)))
      query.processAllAvailable()
      val r2 = Similarity.lshTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(5L), queryId = -1L, k = 3).collect()
      r2.map(_.getLong(0)).take(2).toSet shouldBe Set(5L, 100L)
      r2.take(2).foreach(_.getDouble(1) shouldBe 1.0 +- 1e-9)
    } finally query.stop()
  }

  test("a BATCH-built index keeps its seed corpus after streaming appends") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-index2-").toString
    // the hybrid deployment: index built by the batch writer, then the
    // maintenance stream appends into it — the sink's _spark_metadata
    // log must not shadow the batch-written seed files from queries
    val seed = (1L to 20L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    Similarity.writeLshIndex(seed, "vec_id", "embedding", dir, dim = dim)

    val input = MemoryStream[(Long, Array[Double])]
    val query = Similarity.lshPostings(
        input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        dim = dim)
      .writeStream.format("parquet").option("path", dir)
      .option("checkpointLocation", checkpoint())
      .partitionBy("table", "bucket").outputMode("append").start()
    try {
      input.addData((100L, vec(5L)))
      query.processAllAvailable()
      val r = Similarity.lshTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(5L), queryId = -1L, k = 3).collect()
      // the streamed copy AND the batch-seeded original both answer
      r.map(_.getLong(0)).take(2).toSet shouldBe Set(5L, 100L)
    } finally query.stop()
  }
}
