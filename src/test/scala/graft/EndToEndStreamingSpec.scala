package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.core.Tables
import graft.io.FileSource
import graft.serving.{HttpApi, Serving, ServingTable}

/** Flagship lifecycle test (SURVEY §3.1 end-to-end, on the real events
  * fixture): files arriving in a directory → streaming read through the
  * io/ source abstraction → watermarked event-time tumbling aggregation →
  * update-mode foreachBatch upsert into a serving table → HTTP read of the
  * live state. Every layer is the production path; only the source medium
  * (files for Kafka) differs, per SURVEY §7.4.
  */
class EndToEndStreamingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val client = HttpClient.newHttpClient()

  test("events flow from files through windowed aggregation into HTTP-served state") {
    val srcDir = Files.createTempDirectory("graft-e2e-src")

    // stage the sf0.001 events as the "first day" of arriving data
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    events.coalesce(1).write.mode("overwrite").parquet(srcDir.toString)

    val stream = FileSource(srcDir.toString,
      schemaDDL = Some(events.schema.toDDL)).readStream(spark)

    val perType = stream
      // fixture ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP (the
      // cast is the identity under the UTC session timezone)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("count"))

    val serving = new Serving
    val api = new HttpApi(serving).start()
    val query = serving.maintain(perType, "wordcount", "event_type", checkpoint())
    // ("wordcount" store name so the reference-shaped endpoint serves it:
    //  GET /wordcount/{event_type} -> {"{event_type}": count})

    try {
      query.processAllAvailable()
      val store = serving.table("wordcount").get
      store.size should be > 0

      // serving state equals the batch ground truth per event_type
      val truth = events.groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      truth.foreach { case (tpe, n) =>
        store.get(tpe).map(_("count")) shouldBe Some(n)
        val res = client.send(
          HttpRequest.newBuilder(URI.create(s"http://${api.address}/wordcount/$tpe"))
            .GET().build(), HttpResponse.BodyHandlers.ofString())
        res.statusCode() shouldBe 200
        res.body() shouldBe s"""{"$tpe":$n}"""
      }

      // a second file lands; the served counts move without a restart
      import spark.implicits._
      val tpe = truth.keys.head
      Seq((java.sql.Timestamp.valueOf("2024-01-31 00:00:00"), tpe))
        .toDF("ts", "event_type")
        .select(col("ts").cast("timestamp_ntz").as("ts"), col("event_type"),
          lit(0L).as("event_id"), lit(0L).as("user_id"),
          lit(0.0).as("value"), lit("{}").as("props"))
        .select(events.columns.map(col).toSeq: _*)
        .coalesce(1).write.mode("append").parquet(srcDir.toString)
      query.processAllAvailable()
      store.get(tpe).map(_("count")) shouldBe Some(truth(tpe) + 1)
    } finally { query.stop(); api.stop() }

    Files.exists(Paths.get(srcDir.toString)) shouldBe true
  }
}
