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

  test("interleaveBits matches a reference Morton encoding") {
    import spark.implicits._
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 1L), (1023L, 1023L))
    val out = cases.toDF("a", "b")
      .select(Layout.interleaveBits(col("a"), col("b"), 10).as("z"))
      .as[Long].collect()
    out.toSeq shouldBe cases.map { case (a, b) => morton(a, b, 10) }
  }

  test("z-order shrinks per-file ranges on BOTH axes; single-axis sort does not") {
    // Two independent uniform axes: a perfect single-axis sort leaves the
    // other axis's per-file range at ~the global range, while the Z-curve
    // shares the shrinkage between axes (~1/sqrt(numFiles) each).
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val df = (1 to 20000)
      .map(_ => (rnd.nextInt(100000).toLong, rnd.nextInt(100000).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files.createTempDirectory("graft-zorder-").toString
    Layout.writeZOrdered(df, s"$base/z", numFiles = 16, "x", "y", bits = 10)
    Layout.writeRangeSorted(df, s"$base/linear", 16, col("x"))

    def meanRange(dir: String, c: String): Double = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg(col("r"))).head().getDouble(0)
      perFile / 100000.0 // fraction of the global range
    }
    // z-order: both axes clustered (16 files ~ 4x4 grid => ~1/4 each,
    // loose gate at 0.55); linear sort: x tight but y unclustered (~1.0)
    meanRange(s"$base/z", "x") should be < 0.55
    meanRange(s"$base/z", "y") should be < 0.55
    meanRange(s"$base/linear", "x") should be < 0.15
    meanRange(s"$base/linear", "y") should be > 0.8

    spark.read.parquet(s"$base/z").count() shouldBe 20000L
  }

  test("compact collapses a many-small-files table and round-trips contents") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-").toString + "/t"
    (1 to 10000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(64).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    parquetFiles should be >= 32
    val before = spark.read.parquet(dir).as[(Long, String)].collect().toSet

    val n = Layout.compact(spark, dir, targetFileBytes = 512L << 10)
    n should be < 32
    parquetFiles shouldBe n
    spark.read.parquet(dir).as[(Long, String)].collect().toSet shouldBe before
    // no leftover temp/backup dirs
    new java.io.File(dir).getParentFile.listFiles()
      .map(_.getName).count(_.contains("compact-")) shouldBe 0
  }

  test("z-order keeps null axis values in the first files, not the top cell") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (if (i % 100 == 0) None else Some(i.toLong), i.toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-znull-").toString + "/t"
    Layout.writeZOrdered(df, dir, numFiles = 4, "x", "y", bits = 8)
    val back = spark.read.parquet(dir)
    back.where(col("x").isNull).count() shouldBe 10L
    // nulls cluster: all null-x rows land in a single file
    back.where(col("x").isNull).select(input_file_name()).distinct().count() shouldBe 1L
  }

  test("release manifest: write, verify intact, detect tamper / " +
      "missing / extra files; totals match the dataset") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-")
      .toString + "/rel"
    (1 to 500).map(i => (i.toLong, s"doc $i")).toDF("id", "txt")
      .repartition(4).write.parquet(dir)
    val n = Layout.writeManifest(spark, dir)
    n should be >= 2
    // manifest totals match the dataset
    val man = scala.io.Source.fromFile(s"$dir/_MANIFEST.json").mkString
    man should include(""""rows":500""")
    Layout.verifyManifest(spark, dir) shouldBe empty
    // tamper: flip a byte inside one data file
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).minBy(_.getName)
    val raf = new java.io.RandomAccessFile(f, "rw")
    try { raf.seek(f.length() / 2); raf.writeByte(0x55) }
    finally raf.close()
    Layout.verifyManifest(spark, dir) shouldBe Seq(f.getName)
    // restore confidence boundary: a MISSING listed file also reports
    f.delete() shouldBe true
    Layout.verifyManifest(spark, dir) shouldBe Seq(f.getName)
    // an EXTRA unlisted parquet file is corruption too, not an append
    val extra = new java.io.File(dir, "zz-extra.parquet")
    java.nio.file.Files.write(extra.toPath, Array[Byte](1, 2, 3))
    Layout.verifyManifest(spark, dir) should contain("zz-extra.parquet")
  }
}
