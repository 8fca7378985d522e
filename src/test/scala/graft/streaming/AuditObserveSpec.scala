package graft.streaming

import org.apache.spark.sql.Observation
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalatest.time.{Seconds, Span}

import graft.SparkSpec

/** R2 offset audit + P5 peek/observe, exercised on *running* queries.
  *
  * Audit (reference: `interceptors/FailProofInterceptor.java:21-44` mirrors
  * consumed offsets to an audit topic; E2E `InterceptorTests.java:120-207`):
  * [[AuditListener]] captures each micro-batch's per-source end offsets from
  * `StreamingQueryProgress` — asserted here against a real MemoryStream run.
  *
  * Peek (reference: `WordCountTopology.java:35` logs each record pass-through):
  * `df.observe` metrics — counted on the stream without altering the plan.
  */
class AuditObserveSpec extends AnyFunSuite with Matchers with Eventually with SparkSpec {

  test("AuditListener captures per-batch source offsets from a running query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val audit = new AuditListener("graft-test-app").attach(spark)
    val input = MemoryStream[String]
    val query = Topologies.wordCount(input.toDF()).writeStream
      .outputMode("update").format("noop")
      .option("checkpointLocation", checkpoint())
      .start()

    try {
      input.addData("first wave of records")
      query.processAllAvailable()
      input.addData("second wave")
      query.processAllAvailable()

      // listener events are delivered asynchronously
      val drained = eventually(timeout(Span(20, Seconds))) {
        val d = audit.drain()
        d.size should be >= 2
        d
      }
      all(drained.map(_.appId)) shouldBe "graft-test-app"
      drained.map(_.batchId).distinct.size should be >= 2
      all(drained.map(_.source)) should include("MemoryStream")
      // offsets advance monotonically across batches for the same source
      val offs = drained.sortBy(_.batchId).map(_.endOffset.toLong)
      offs shouldBe offs.sorted

      // R2 parity: mirror the drained audit rows to a durable side table
      // (the reference produces them to an `audit-offsets` topic)
      val auditDir = java.nio.file.Files.createTempDirectory("graft-audit").toString
      drained.toDS().toDF().write.mode("overwrite").parquet(auditDir)
      val mirrored = spark.read.parquet(auditDir)
      mirrored.count() shouldBe drained.size.toLong
      mirrored.columns.sorted shouldBe Array("appId", "batchId", "endOffset", "source")
    } finally {
      query.stop()
      spark.streams.removeListener(audit)
    }
  }

  test("restart replays the last COMMITTED offsets into the audit " +
      "trail before any new batch's rows (FailProofInterceptor's " +
      "configure-time audit re-read)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ckpt = checkpoint()
    def run(input: MemoryStream[String]) =
      Topologies.wordCount(input.toDF()).writeStream
        .outputMode("update").format("noop")
        .option("checkpointLocation", ckpt)
        .start()

    // first incarnation: two committed batches, then a stop
    val in1 = MemoryStream[String]
    val q1 = run(in1)
    try {
      in1.addData("alpha beta"); q1.processAllAvailable()
      in1.addData("gamma"); q1.processAllAvailable()
    } finally q1.stop()

    // restart: the replay seeds the trail BEFORE the new query runs
    val audit = new AuditListener("graft-replay-app")
    val replayed = audit.replayCommitted(spark, ckpt)
    replayed should not be empty
    all(replayed.map(_.source)) should startWith("checkpoint-replay:")
    all(replayed.map(_.endOffset)) should not be empty
    val lastCommitted = replayed.map(_.batchId).max

    audit.attach(spark)
    // restart on the SAME MemoryStream: its offsets index the stream's
    // in-memory buffer, so only the original instance can resume the
    // checkpoint (a file/Kafka source restarts from any incarnation)
    val q2 = run(in1)
    try {
      in1.addData("delta epsilon"); q2.processAllAvailable()
      val drained = eventually(timeout(Span(20, Seconds))) {
        val d = audit.drain()
        d.exists(_.source.contains("MemoryStream")) shouldBe true
        d
      }
      // replayed rows precede the restarted query's progress rows, and
      // the new batch continues numbering past the committed one
      val ours = drained.filter(r =>
        r.source.startsWith("checkpoint-replay:") ||
          r.source.contains("MemoryStream"))
      ours.takeWhile(_.source.startsWith("checkpoint-replay:")) shouldBe replayed
      val newBatches = ours.filter(_.source.contains("MemoryStream"))
        .map(_.batchId)
      all(newBatches) should be > lastCommitted
    } finally {
      q2.stop()
      spark.streams.removeListener(audit)
    }

    // a fresh checkpoint has nothing committed, nothing to replay
    new AuditListener("x").replayCommitted(spark, checkpoint()) shouldBe empty
  }

  test("peek/observe counts records in-flight without changing results (batch)") {
    import spark.implicits._
    val obs = Observation("peek")
    val df = Seq("a b", "b c").toDF("value")
    val out = Topologies.wordCount(df.observe(obs, count(lit(1)).as("records")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 1L, "b" -> 2L, "c" -> 1L)
    obs.get("records") shouldBe 2L
  }

  test("streaming observe metrics surface in query progress") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[String]
    val query = Topologies.wordCount(
        input.toDF().observe("peek", count(lit(1)).as("records")))
      .writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", checkpoint())
      .start()

    try {
      input.addData("one two", "three")
      query.processAllAvailable()
      val observed = eventually(timeout(Span(20, Seconds))) {
        val ps = query.recentProgress.filter(_.observedMetrics.containsKey("peek"))
        ps should not be empty
        ps.last.observedMetrics.get("peek")
      }
      observed.getAs[Long]("records") shouldBe 2L
    } finally query.stop()
  }
}
