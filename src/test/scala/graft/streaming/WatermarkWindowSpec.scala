package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Event-time windows on a real stream with a watermark (SURVEY §2.6
  * event-time row; the reference's `Suppressed`-style emit-final is
  * Spark's append mode): a window's aggregate is emitted exactly once,
  * only after the watermark passes its end, and a late record beyond the
  * watermark is dropped rather than reopening the window.
  */
class WatermarkWindowSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("append-mode tumbling window emits once the watermark passes; late data dropped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(Timestamp, Double)]
    val windowed = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "5 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("ws"), col("cnt"), col("sum_value"))

    var emitted = Vector.empty[(Timestamp, Long, Double)]
    val query = windowed.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted ++= b.collect().map(r =>
          (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
      }.start()

    try {
      // wave 1: all inside window [10:00, 10:10) — watermark not past it yet
      input.addData((ts(1), 1.0), (ts(4), 2.0), (ts(8), 3.0))
      query.processAllAvailable()
      emitted shouldBe empty // emit-final: nothing until the window closes

      // wave 2: event at 10:16 pushes watermark to 10:11 > 10:10 → emit
      input.addData((ts(16), 10.0))
      query.processAllAvailable()
      emitted shouldBe Vector((ts(0), 3L, 6.0))

      // wave 3: a record at 10:03 is behind the watermark — dropped, the
      // closed window is NOT re-emitted with a new count
      input.addData((ts(3), 100.0))
      query.processAllAvailable()
      emitted shouldBe Vector((ts(0), 3L, 6.0))
    } finally query.stop()
  }

  test("streaming session window merges gap-bounded activity per key") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, Timestamp)]
    val sessions = input.toDF().toDF("user", "ts")
      .withWatermark("ts", "2 minutes")
      .groupBy(col("user"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user"), col("session_window.start").as("ss"), col("cnt"))

    var emitted = Vector.empty[(String, Timestamp, Long)]
    val query = sessions.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        emitted ++= b.collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      }.start()

    try {
      // u1: events at 10:00/10:03/10:06 chain into ONE session (gaps < 5m);
      // a later event at 10:20 is > 5m after 10:06 → a new session
      input.addData(("u1", ts(0)), ("u1", ts(3)), ("u1", ts(6)), ("u2", ts(1)))
      query.processAllAvailable()
      input.addData(("u1", ts(20)))
      query.processAllAvailable()
      // push the watermark far past every session end to flush them all
      input.addData(("u3", ts(59)))
      query.processAllAvailable()

      emitted.sortBy(e => (e._1, e._2.getTime)).map(e => (e._1, e._2, e._3)) shouldBe
        Vector(("u1", ts(0), 3L), ("u1", ts(20), 1L), ("u2", ts(1), 1L))
    } finally query.stop()
  }
}
