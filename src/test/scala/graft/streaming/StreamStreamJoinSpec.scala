package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Stream-stream interval join (SURVEY §2.6 joins: "stream-stream with
  * watermark + time-range condition"): impressions joined to clicks that
  * land within 10 minutes AFTER them. Watermarks on both sides bound the
  * join state — each side keeps only rows the other might still match.
  */
class StreamStreamJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("impressions join clicks within the time bound; out-of-window pairs drop") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val impressions = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]

    val joined = impressions.toDF().toDF("ad", "impTs")
      .withWatermark("impTs", "20 minutes")
      .join(
        clicks.toDF().toDF("cad", "clickTs")
          .withWatermark("clickTs", "20 minutes"),
        expr("ad = cad AND clickTs >= impTs AND clickTs <= impTs + INTERVAL 10 MINUTES"))
      .select("ad", "impTs", "clickTs")

    var pairs = Vector.empty[(String, Timestamp, Timestamp)]
    val query = joined.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        pairs ++= b.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2)))
      }.start()

    try {
      impressions.addData(("ad1", ts(0)), ("ad2", ts(5)))
      query.processAllAvailable()
      // clicks arrive in a LATER batch: ad1 inside its 10m window,
      // ad2 outside (25 > 5 + 10), ad3 never had an impression
      clicks.addData(("ad1", ts(7)), ("ad2", ts(25)), ("ad3", ts(8)))
      query.processAllAvailable()

      pairs shouldBe Vector(("ad1", ts(0), ts(7)))

      // a second click on the same impression within bound also matches
      clicks.addData(("ad1", ts(9)))
      query.processAllAvailable()
      pairs.toSet shouldBe Set(
        ("ad1", ts(0), ts(7)), ("ad1", ts(0), ts(9)))
    } finally query.stop()
  }
}
