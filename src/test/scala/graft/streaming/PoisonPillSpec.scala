package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Poison-pill resilience (reference: `main/Uppercase.java:33-36` throws on
  * "quack"; `resilience/ReplaceThreadExceptionHandler.java:8-17` skips the
  * record and resumes; E2E scenario `test/.../ReplaceThreadTests.java:133-154`
  * sends moo/quack/oink and asserts processing continues past the failure).
  *
  * In this engine the skip is *in the plan* (SURVEY §2.5 R1): the poison
  * predicate splits the stream into an ok path and a dead-letter path, so a
  * deterministic bad record can never wedge the query the way it would wedge
  * Spark's task retry.
  */
class PoisonPillSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("streaming uppercase continues past the poison record; dead-letter holds it") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val input = MemoryStream[(String, String)]
    val records = input.toDF().toDF("key", "value")
    val (ok, dead) = Topologies.uppercaseSplit(records)

    var okRows = Vector.empty[(String, String)]
    var deadRows = Vector.empty[(String, String, String)]
    val okQuery = ok.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        okRows ++= b.collect().map(r => (r.getString(0), r.getString(1)))
      }.start()
    val deadQuery = dead.writeStream.outputMode("append")
      .option("checkpointLocation", checkpoint())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        deadRows ++= b.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      }.start()

    try {
      input.addData(("1", "moo"), ("2", "quack"), ("3", "oink"))
      okQuery.processAllAvailable()
      deadQuery.processAllAvailable()

      // records before AND after the poison one were processed
      okRows.map(_._2).sorted shouldBe Vector("MOO", "OINK")
      // the poison record is not lost: it sits in the dead-letter with why
      deadRows shouldBe Vector(("2", "quack", "poison value"))
    } finally { okQuery.stop(); deadQuery.stop() }
  }

  test("batch twin: same plan, same split") {
    import spark.implicits._
    val records = Seq(("1", "moo"), ("2", "quack"), ("3", "oink")).toDF("key", "value")
    val (ok, dead) = Topologies.uppercaseSplit(records)
    ok.select(col("value")).as[String].collect().sorted shouldBe Array("MOO", "OINK")
    dead.select(col("value")).as[String].collect() shouldBe Array("quack")
  }
}
