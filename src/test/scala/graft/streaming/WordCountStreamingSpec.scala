package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.serving.Serving

/** The reference's canonical streaming scenario (reference:
  * `test/.../WordCountTopologyTest.java:41-53`): pipe sentences into the
  * word-count topology, observe the *continuously updated* per-word count —
  * a chosen word reaches 3, then one more sentence arrives and it reads 4.
  *
  * Executed for real: `MemoryStream` → update-mode streaming aggregation →
  * `foreachBatch` upsert into a [[graft.serving.ServingTable]] (the
  * queryable-state analog of the reference's `WORDCOUNT_STORE`).
  */
class WordCountStreamingSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("continuous word count updates 3 -> 4 across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[String]
    val counts = Topologies.wordCount(input.toDF())

    val serving = new Serving
    val query = serving.maintain(counts, "wordcount", "word", checkpoint())
    val store = serving.table("wordcount").get

    try {
      // wave 1: the word "stream" appears three times across three sentences
      input.addData(
        "every stream begins somewhere",
        "a stream of records is not a table",
        "count the stream, not the words you guess")
      query.processAllAvailable()
      store.get("stream").map(_("count")) shouldBe Some(3L)

      // wave 2: one more occurrence — the serving view must read 4
      input.addData("the same stream, one batch later")
      query.processAllAvailable()
      store.get("stream").map(_("count")) shouldBe Some(4L)

      // untouched keys keep their counts (update mode re-emits only deltas)
      store.get("records").map(_("count")) shouldBe Some(1L)
    } finally query.stop()
  }

  test("update mode emits only changed keys per micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[String]
    val counts = Topologies.wordCount(input.toDF())

    var lastBatch: Seq[(String, Long)] = Nil
    val query = counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = batch.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
        if (rows.nonEmpty) lastBatch = rows
      }
      .start()

    try {
      input.addData("alpha beta", "alpha gamma")
      query.processAllAvailable()
      lastBatch.toMap shouldBe Map("alpha" -> 2L, "beta" -> 1L, "gamma" -> 1L)

      input.addData("beta")
      query.processAllAvailable()
      // only beta changed; alpha/gamma must NOT be re-emitted
      lastBatch.toMap shouldBe Map("beta" -> 2L)
    } finally query.stop()
  }
}
