package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.LexicalIndex

/** The single-maintainer lease fence: a second mutator arriving while a
  * maintenance lease is held must fail LOUD (the silent alternative is an
  * append dropped by a concurrent compaction's swap), the lease must
  * release on BOTH success and body failure, and a typo'd index root must
  * not be silently created by the fence itself.
  */
class MaintenanceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i => i -> s"term${i % 5} shared pad$i")
      .toDF("doc_id", "text")
  }

  test("a second mutator mid-run throws ConcurrentMaintenanceException " +
      "naming the holder") {
    val dir = Spill.tempDir("graft-lease-") + "/idx"
    LexicalIndex.write(corpus(10), "doc_id", "text", dir, nBuckets = 4)
    Maintenance.withLease(spark, dir, "outer-test") {
      val e = intercept[Maintenance.ConcurrentMaintenanceException] {
        LexicalIndex.append(spark, dir, corpus(5), "doc_id", "text")
      }
      e.getMessage should include("another maintainer holds")
      e.getMessage should include("op=outer-test")
      // compact is fenced by the same lease
      intercept[Maintenance.ConcurrentMaintenanceException] {
        LexicalIndex.compact(spark, dir)
      }
    }
    // the outer lease released on success: mutation works again
    LexicalIndex.append(spark, dir, corpus(3).withColumn("doc_id",
      col("doc_id") + 100), "doc_id", "text")
  }

  test("the lease releases when the body throws") {
    val dir = Spill.tempDir("graft-lease-") + "/idx"
    LexicalIndex.write(corpus(6), "doc_id", "text", dir, nBuckets = 4)
    val boom = intercept[RuntimeException] {
      Maintenance.withLease(spark, dir, "failing-body") {
        sys.error("body failed")
      }
    }
    boom.getMessage should include("body failed")
    val fs = Maintenance.leasePath(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(Maintenance.leasePath(dir)) shouldBe false
    // and a later maintainer proceeds
    Maintenance.withLease(spark, dir, "after-failure") { () }
  }

  test("fencing a nonexistent index root fails loud instead of creating it") {
    val dir = Spill.tempDir("graft-lease-") + "/typod"
    val e = intercept[IllegalArgumentException] {
      Maintenance.withLease(spark, dir, "typo") { () }
    }
    e.getMessage should include("does not exist")
    new java.io.File(dir).exists() shouldBe false
  }

  test("a crashed maintainer's stale lease blocks until deleted, then " +
      "recovery proceeds") {
    val dir = Spill.tempDir("graft-lease-") + "/idx"
    LexicalIndex.write(corpus(6), "doc_id", "text", dir, nBuckets = 4)
    val lease = Maintenance.leasePath(dir)
    val fs = lease.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(lease, false) // simulate a maintainer that died
    out.write("op=dead pid=0 at=never\n".getBytes("UTF-8")); out.close()
    intercept[Maintenance.ConcurrentMaintenanceException] {
      LexicalIndex.append(spark, dir, corpus(2), "doc_id", "text")
    }
    fs.delete(lease, false) // the documented manual recovery
    LexicalIndex.append(spark, dir, corpus(2).withColumn("doc_id",
      col("doc_id") + 50), "doc_id", "text")
  }
}
