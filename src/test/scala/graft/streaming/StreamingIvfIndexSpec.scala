package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming maintenance of the cell-partitioned IVF index — the IVF twin
  * of `StreamingLshIndexSpec`: [[Similarity.ivfPostings]] assigns arriving
  * vectors to the PERSISTED centroids with pure column expressions (no
  * KMeans model, so it runs on a streaming frame) and the file sink
  * appends them into `postings/cell=N` with exactly-once semantics from
  * the checkpoint. Queries keep pruning to nProbe cell directories; the
  * quantizer is only refit on a rebuild cadence, never per batch.
  */
class StreamingIvfIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dim = 8

  private def vec(id: Long): Array[Double] = {
    val v = new Array[Double](dim)
    v((id % dim).toInt) = 1.0
    v(((id + 3) % dim).toInt) += 0.1 * ((id % 5) + 1)
    v
  }

  test("streamed vectors land in the cell-partitioned index and are found by pruned queries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-ivf-").toString

    // index built once from a seed corpus (the quantizer's fit)
    val seedCorpus = (1L to 20L).map(id => (id, vec(id))).toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(seedCorpus, "vec_id", "embedding", dir, nList = 4)
    val centroids = Similarity.readIvfCentroids(spark, dir)

    val input = MemoryStream[(Long, Array[Double])]
    val postings = Similarity.ivfPostings(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", centroids)
    val query = postings.writeStream
      .format("parquet")
      .option("path", s"$dir/postings")
      .option("checkpointLocation", checkpoint())
      .partitionBy("cell")
      .outputMode("append")
      .start()
    try {
      // a new exact copy of vector 5 arrives: it must join vector 5's cell
      // and become the top pruned-query hit
      input.addData((100L, vec(5L)))
      query.processAllAvailable()
      val r1 = Similarity.ivfTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(5L), queryId = 5L, k = 1, nProbe = 1).collect()
      r1.head.getLong(0) shouldBe 100L
      r1.head.getDouble(1) shouldBe 1.0 +- 1e-9

      // second micro-batch appends on top of the first
      input.addData((101L, vec(2L)))
      query.processAllAvailable()
      val r2 = Similarity.ivfTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(2L), queryId = 2L, k = 1, nProbe = 1).collect()
      r2.head.getLong(0) shouldBe 101L

      // the BATCH-built seed corpus stays visible alongside the sink's
      // rows: the streaming sink leaves a _spark_metadata log, and a
      // naive batch read of the postings root would resolve ONLY
      // sink-committed files — 20 seed + 2 streamed - the excluded
      // query id must all surface under a full probe
      Similarity.ivfTopKIndexed(spark, dir, "vec_id", "embedding",
        vec(2L), queryId = 2L, k = 50, nProbe = 4).count() shouldBe 21
    } finally query.stop()

    // appended rows live under the same cell=N layout the batch build made
    new java.io.File(s"$dir/postings").listFiles()
      .count(_.getName.startsWith("cell=")) should be <= 4
  }
}
