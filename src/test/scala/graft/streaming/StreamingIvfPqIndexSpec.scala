package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.Similarity

/** Streaming maintenance of the IVF-PQ index — completes the streaming
  * twin family for the compressed index: [[Similarity.ivfPqPostings]]
  * assigns arriving vectors to the PERSISTED centroids and encodes their
  * residuals against the PERSISTED codebook with pure column expressions
  * (no model, no fit), and the file sink appends the m-byte codes into
  * `postings/cell=N` with exactly-once semantics from the checkpoint.
  * Queries keep pruning to nProbe cell directories.
  */
class StreamingIvfPqIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dim = 8

  private def vec(id: Long): Array[Double] = {
    val v = new Array[Double](dim)
    v((id % dim).toInt) = 1.0
    v(((id + 3) % dim).toInt) += 0.1 * ((id % 5) + 1)
    v
  }

  test("streamed vectors are PQ-encoded into the index and found by pruned queries") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-stream-ivfpq-").toString

    val seedCorpus = (1L to 20L).map(id => (id, vec(id)))
      .toDF("vec_id", "embedding")
    Similarity.writeIvfPqIndex(seedCorpus, "vec_id", "embedding", dir,
      nList = 4, m = 4, ksub = 8)
    val centroids = Similarity.readIvfCentroids(spark, dir)
    val codebook = Similarity.readPqCodebook(spark, dir)

    val input = MemoryStream[(Long, Array[Double])]
    val postings = Similarity.ivfPqPostings(
      input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", centroids, codebook)
    val query = postings.writeStream
      .format("parquet")
      .option("path", s"$dir/postings")
      .option("checkpointLocation", checkpoint())
      .partitionBy("cell")
      .outputMode("append")
      .start()
    try {
      // an exact copy of vector 5 arrives: identical residual -> the
      // SAME codes as the build-time row for vector 5, so its ADC
      // distance ties vector 5's own — it must surface in the top hits
      input.addData((100L, vec(5L)))
      query.processAllAvailable()
      val r1 = Similarity.ivfPqTopKIndexed(spark, dir, "vec_id", vec(5L),
        queryId = 5L, k = 3, nProbe = 2).collect()
      r1.map(_.getLong(0)) should contain(100L)

      // second micro-batch appends on top of the first
      input.addData((101L, vec(2L)))
      query.processAllAvailable()
      Similarity.ivfPqTopKIndexed(spark, dir, "vec_id", vec(2L),
          queryId = 2L, k = 3, nProbe = 2)
        .collect().map(_.getLong(0)) should contain(101L)

      // seed corpus + streamed rows BOTH visible past the sink's
      // _spark_metadata log (20 seed + 2 streamed - the query id)
      Similarity.ivfPqTopKIndexed(spark, dir, "vec_id", vec(2L),
        queryId = 2L, k = 50, nProbe = 4).count() shouldBe 21
    } finally query.stop()

    // the streamed rows carry the SAME code bytes the batch encoder
    // would produce (one fixed codebook -> one layout, no drift)
    val streamed = spark.read.parquet(s"$dir/postings")
      .where(org.apache.spark.sql.functions.col("vec_id") === 100L)
      .select("pq").head().getAs[Array[Byte]](0)
    val batch = Similarity.ivfPqPostings(
        Seq((100L, vec(5L))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", centroids, codebook)
      .select("pq").head().getAs[Array[Byte]](0)
    streamed.toSeq shouldBe batch.toSeq
  }
}
