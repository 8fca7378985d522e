package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Layout.writeRangeSorted]] must produce files whose value ranges are
  * DISJOINT — the property parquet min/max skipping needs to prune whole
  * files for a range predicate. Asserted by reading each output file
  * separately and checking its [min, max] interval against every other's.
  */
class LayoutSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("range-sorted layout yields disjoint per-file date ranges") {
    val orders = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val dir = java.nio.file.Files.createTempDirectory("graft-layout-").toString + "/orders"
    Layout.writeRangeSorted(orders, dir, numFiles = 4, col("o_orderdate"))

    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath)
    files.length should be >= 3 // repartitionByRange(4) may merge tiny tails

    val ranges = files.map { f =>
      // NTZ timestamps surface as LocalDateTime; compare as epoch seconds
      val r = spark.read.parquet(f)
        .agg(min(unix_timestamp(col("o_orderdate").cast("timestamp"))),
          max(unix_timestamp(col("o_orderdate").cast("timestamp")))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // every file's range ends before the next file's begins
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => hiA should be <= loB
      case _ =>
    }

    // and the full table round-trips
    spark.read.parquet(dir).count() shouldBe orders.count()
  }
}
