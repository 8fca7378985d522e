package graft.io

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Dead-letter routing at the deserialization edge: corrupt values go to
  * the dead letter with raw bytes preserved; partial documents parse
  * permissively; the same split runs on a streaming frame.
  */
class IngestSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val schema = "customerId INT, productId INT, quantity INT"

  test("corrupt JSON dead-letters with the raw value; good rows parse") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"customerId": 7, "productId": 3, "quantity": 2}"""),
      (2L, """NOT JSON AT ALL"""),
      (3L, """{"customerId": 8}"""), // partial: permissive, absent fields null
      (4L, """[1,2,3]""")            // wrong shape: dead letter
    ).toDF("id", "value")

    val (ok, dead) = Ingest.jsonDeadLetterSplit(df, "value", schema)

    ok.select("id", "customerId", "productId", "quantity")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3))).toSet shouldBe
      Set((1L, 7, 3, 2), (3L, 8, null, null))
    dead.select("id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet shouldBe
      Set((2L, "NOT JSON AT ALL"), (4L, "[1,2,3]"))
  }

  test("the identical split runs on a streaming source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val (ok, dead) = Ingest.jsonDeadLetterSplit(
      input.toDF().toDF("id", "value"), "value", schema)

    val okQ = ok.writeStream.format("memory").queryName("ingest_ok")
      .option("checkpointLocation", checkpoint()).start()
    val deadQ = dead.writeStream.format("memory").queryName("ingest_dead")
      .option("checkpointLocation", checkpoint()).start()
    try {
      input.addData((1L, """{"customerId": 1, "productId": 2, "quantity": 3}"""),
        (2L, "garbage"))
      okQ.processAllAvailable(); deadQ.processAllAvailable()
      spark.table("ingest_ok").count() shouldBe 1
      spark.table("ingest_dead").select("value").head().getString(0) shouldBe "garbage"
    } finally { okQ.stop(); deadQ.stop() }
  }
}
