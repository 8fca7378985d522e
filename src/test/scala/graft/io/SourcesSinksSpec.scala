package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.streaming.Topologies

/** io/ abstraction (SURVEY §7.1 module 3): Consumed/Produced analogs with
  * batch + streaming twins, record-metadata columns (P6), multi-format
  * file entry points (S7), and the JSON wire framing (S4 serde step).
  */
class SourcesSinksSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("FileSource batch read with record metadata columns (P6)") {
    val df = FileSource(s"$sfDir/documents.parquet", withMetadata = true).read(spark)
    df.columns should contain allOf ("topic", "partition", "offset")

    val rows = df.select("doc_id", "topic", "offset").collect()
    rows.length should be > 0
    all(rows.map(_.getString(1))) should include("documents.parquet")
    // offset is the record's durable position in its file: doc_id order
    rows.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).map(_._2) shouldBe
      rows.map(_.getLong(2)).sorted
  }

  test("FileSource streaming twin produces the same schema and feeds a topology") {
    // streaming file sources watch a directory for arriving files
    val dir = Files.createTempDirectory("graft-stream-src")
    Files.copy(java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val src = FileSource(dir.toString, withMetadata = true)
    val stream = src.readStream(spark)
    stream.isStreaming shouldBe true
    stream.schema shouldBe src.read(spark).schema

    val counts = Topologies.wordCount(stream.select(col("text").as("value")))
    val query = counts.writeStream.outputMode("update").format("noop")
      .option("checkpointLocation", checkpoint())
      .start()
    try {
      query.processAllAvailable()
      query.lastProgress.sources should have length 1
    } finally query.stop()
  }

  test("FileSource reads csv and json formats (S7)") {
    val dir = Files.createTempDirectory("graft-io").toString
    import spark.implicits._
    val df = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")

    FileSink(s"$dir/csv", "csv", Map("header" -> "true")).write(df)
    val csv = FileSource(s"$dir/csv", "csv",
      options = Map("header" -> "true", "inferSchema" -> "true")).read(spark)
    csv.orderBy("id").collect().map(_.getString(1)) shouldBe Array("alpha", "beta")

    FileSink(s"$dir/json", "json").write(df)
    val json = FileSource(s"$dir/json", "json", schemaDDL = Some("id LONG, name STRING"))
      .read(spark)
    json.orderBy("id").collect().map(_.getString(1)) shouldBe Array("alpha", "beta")
  }

  test("jsonRecords frames keyed rows as (key, value) wire records (S4)") {
    import spark.implicits._
    val out = Sinks.jsonRecords(
      Seq(("7-101", 2L, 5.0)).toDF("k", "count", "total"), "k").collect()
    out.map(r => (r.getString(0), r.getString(1))) shouldBe
      Array(("7-101", """{"count":2,"total":5.0}"""))
  }

  test("file sink round-trips a streaming topology result (S3)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sink").toString

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val (ok, _) = Topologies.uppercaseSplit(input.toDF())
    val query = FileSink(s"$dir/out").writeStream(ok, checkpoint())
    try {
      input.addData("moo", "oink")
      query.processAllAvailable()
    } finally query.stop()

    spark.read.parquet(s"$dir/out").collect().map(_.getString(0)).sorted shouldBe
      Array("MOO", "OINK")
  }

  test("KafkaSource reader options can't rot (S6 — execution environment-blocked)") {
    // no spark-sql-kafka connector jar ships in this container, so the
    // wiring is compile-only; this pins the OPTION CONTRACT the connector
    // would receive (subscribe + the reference's AUTO_OFFSET_RESET analog)
    val src = KafkaSource("broker:9092", "purchases", startingOffsets = "earliest")
    src.streamOptions shouldBe Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "purchases",
      "startingOffsets" -> "earliest")
    src.batchOptions shouldBe (src.streamOptions - "startingOffsets")
    KafkaSource("b:9092", "t").streamOptions("startingOffsets") shouldBe "latest"

    // the read path must reach Spark's source RESOLUTION for format
    // "kafka" with those options: absent the jar that is exactly the
    // missing-provider error (anything else — an option or analysis
    // error — would mean the wiring broke)
    val ex = intercept[Throwable] { src.readStream(spark) }
    ex.getMessage.toLowerCase should include("kafka")
    ex.getMessage should (include("Failed to find") or include("FAILED_TO_FIND"))
  }
}
