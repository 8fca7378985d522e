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
}
