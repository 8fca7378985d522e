package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Last-write-wins upsert semantics: updates shadow target rows per key,
  * inserts append, tombstones delete, untouched rows survive byte-for-byte.
  */
class MergeSpec extends AnyFunSuite with Matchers with SparkSpec {

  import Merge._

  private def df(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }

  test("update wins, insert appends, untouched rows survive") {
    import spark.implicits._
    val out = upsert(
      df(1L -> "a", 2L -> "b", 3L -> "c"),
      df(2L -> "B2", 9L -> "new"), Seq("id"))
      .as[(Long, String)].collect().toSet
    out shouldBe Set(1L -> "a", 2L -> "B2", 3L -> "c", 9L -> "new")
  }

  test("tombstone rows delete their keys and never surface") {
    import spark.implicits._
    val target = df(1L -> "a", 2L -> "b", 3L -> "c")
    val updates = Seq((2L, "ignored", true), (3L, "C2", false), (4L, "d", false))
      .toDF("id", "v", "deleted")
    val out = upsert(target.withColumn("deleted", lit(false)), updates,
      Seq("id"), tombstoneCol = Some("deleted"))
      .as[(Long, String)].collect().toSet
    out shouldBe Set(1L -> "a", 3L -> "C2", 4L -> "d")
  }

  test("upsertWrite swaps the merged table in place, no leftovers") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-merge-").toString + "/t"
    df(1L -> "a", 2L -> "b").write.parquet(dir)
    upsertWrite(spark, dir, df(2L -> "B2", 5L -> "e"), Seq("id"))
    spark.read.parquet(dir).as[(Long, String)].collect().toSet shouldBe
      Set(1L -> "a", 2L -> "B2", 5L -> "e")
    new java.io.File(dir).getParentFile.listFiles()
      .map(_.getName).count(_.contains("merge-")) shouldBe 0
  }

  test("multi-version update batches collapse to the highest version per key") {
    import spark.implicits._
    val target = Seq((1L, "a", 0L), (2L, "b", 0L)).toDF("id", "v", "ver")
    val updates = Seq((1L, "v1", 1L), (1L, "v2", 2L), (3L, "c", 1L))
      .toDF("id", "v", "ver")
    val out = upsert(target, updates, Seq("id"), versionCol = Some("ver"))
      .select("id", "v").as[(Long, String)].collect()
    out.map(_._1).sorted shouldBe out.map(_._1).distinct.sorted // one row/key
    out.toSet shouldBe Set(1L -> "v2", 2L -> "b", 3L -> "c")
  }

  test("idempotent: re-applying the same updates changes nothing") {
    import spark.implicits._
    val once = upsert(df(1L -> "a", 2L -> "b"), df(2L -> "B2"), Seq("id"))
    val twice = upsert(once, df(2L -> "B2"), Seq("id"))
    twice.as[(Long, String)].collect().toSet shouldBe
      once.as[(Long, String)].collect().toSet
  }
}
