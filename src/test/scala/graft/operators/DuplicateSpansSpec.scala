package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Duplicate-SPAN detection (substring-level dedup): planted fixtures pin
  * the span identity — overlap merging, adjacency, disjoint spans,
  * within-document repeats — and the strip twin's token-conservation
  * invariant `kept = total - dup_tokens`.
  */
class DuplicateSpansSpec extends AnyFunSuite with Matchers with SparkSpec {

  import spark.implicits._

  // 12 distinct filler words keep windows unique unless planted otherwise
  private def filler(tag: String, n: Int): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  private val boiler = "alpha bravo charlie delta echo foxtrot golf hotel"

  test("a shared k-token block yields one merged span in each document") {
    // the 8-word boiler block sits at different offsets in two documents;
    // its 8-token windows (just one here) are corpus-duplicated, all other
    // windows are unique
    val docs = Seq(
      (1L, s"$boiler ${filler("u", 12)}"),
      (2L, s"${filler("v", 12)} $boiler")).toDF("doc_id", "text")

    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 1L, 8L), (2L, 1L, 8L))
  }

  test("overlapping duplicated windows merge into one span with union coverage") {
    // a 10-word shared block → three 8-token windows per doc at gaps 1,1;
    // coverage = 8 + 1 + 1 = 10, one merged span
    val block = s"$boiler india juliet"
    val docs = Seq(
      (1L, s"$block ${filler("u", 12)}"),
      (2L, s"${filler("v", 12)} $block")).toDF("doc_id", "text")

    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 1L, 10L), (2L, 1L, 10L))
  }

  test("disjoint duplicated blocks stay separate spans; clean docs are absent") {
    val block2 = "kilo lima mike november oscar papa quebec romeo"
    val docs = Seq(
      (1L, s"$boiler ${filler("u", 12)} $block2"),
      (2L, s"$boiler ${filler("v", 12)} $block2"),
      (3L, filler("w", 30))).toDF("doc_id", "text")

    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 2L, 16L), (2L, 2L, 16L))
  }

  test("a within-document repeat counts toward minCount") {
    // the block appears twice in ONE document; corpus count of its window
    // is 2, so both occurrences are duplicated spans
    val docs = Seq(
      (1L, s"$boiler ${filler("u", 12)} $boiler"),
      (2L, filler("v", 30))).toDF("doc_id", "text")

    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .as[(Long, Long, Long)].collect()
    got shouldBe Array((1L, 2L, 16L))
  }

  test("strip removes exactly the duplicated tokens and keeps survivor order") {
    val docs = Seq(
      (1L, s"$boiler ${filler("u", 12)}"),
      (2L, s"${filler("v", 12)} $boiler"),
      (3L, filler("w", 30))).toDF("doc_id", "text")

    val stripped = Dedup.stripDuplicateSpans(docs, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, String)].collect()

    stripped(0)._2 shouldBe filler("u", 12)
    stripped(1)._2 shouldBe filler("v", 12)
    stripped(2)._2 shouldBe filler("w", 30) // clean doc: normalized passthrough
  }

  test("incremental spans: empty history reproduces the batch operator; " +
      "history flags cross-batch recurrence; replay and compaction are stable") {
    val table = java.nio.file.Files
      .createTempDirectory("graft-span-counts").toString + "/counts"

    val batch1 = Seq(
      (1L, s"$boiler ${filler("u", 12)}"),
      (2L, s"${filler("v", 12)} $boiler")).toDF("doc_id", "text")
    val got1 = Dedup.incrementalDuplicateSpans(
        batch1, "doc_id", "text", table, k = 8, batchId = "b1")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    val eager1 = Dedup.duplicateSpans(batch1, "doc_id", "text", k = 8)
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    got1 shouldBe eager1 // empty history: exactly the batch operator

    // batch 2 holds the boiler ONCE (unique within the batch) plus a truly
    // novel block: only the remembered boiler flags
    val batch2 = Seq(
      (10L, s"$boiler ${filler("x", 12)}"),
      (11L, s"${filler("y", 12)} kilo lima mike november oscar papa quebec romeo"))
      .toDF("doc_id", "text")
    val got2 = Dedup.incrementalDuplicateSpans(
        batch2, "doc_id", "text", table, k = 8, batchId = "b2")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    got2 shouldBe Array((10L, 1L, 8L))

    // replaying batch 2 (same id) must not count its own first attempt:
    // identical result, not an inflated one
    val replay = Dedup.incrementalDuplicateSpans(
        batch2, "doc_id", "text", table, k = 8, batchId = "b2")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    replay shouldBe got2

    // compaction folds the batch dirs; a third batch reads the same history
    val before = Dedup.incrementalDuplicateSpans(
        Seq((20L, s"$boiler ${filler("z", 12)}")).toDF("doc_id", "text"),
        "doc_id", "text", table, k = 8, batchId = "probe")
      .as[(Long, Long, Long)].collect()
    // drop the probe's own counts again so the comparison is clean
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$table/batch=probe"), true)
    Dedup.compactSpanCounts(spark, table) should be >= 1
    fs.listStatus(new org.apache.hadoop.fs.Path(table))
      .count(_.getPath.getName.startsWith("batch=")) shouldBe 1
    val after = Dedup.incrementalDuplicateSpans(
        Seq((20L, s"$boiler ${filler("z", 12)}")).toDF("doc_id", "text"),
        "doc_id", "text", table, k = 8, batchId = "probe2")
      .as[(Long, Long, Long)].collect()
    after shouldBe before
  }

  test("all-numeric batch dirs (streaming epoch ids) still read as strings " +
      "for a later non-numeric batch id") {
    val table = java.nio.file.Files
      .createTempDirectory("graft-span-epochs").toString + "/counts"
    // epoch-style ids make every partition value numeric; without an
    // explicit read schema Spark infers `batch` as int and the history
    // filter against "oneshot-<uuid>" crashes under ANSI
    Dedup.incrementalDuplicateSpans(
      Seq((1L, s"$boiler ${filler("u", 12)}")).toDF("doc_id", "text"),
      "doc_id", "text", table, k = 8, batchId = "0").collect()
    val oneshot = Dedup.incrementalDuplicateSpans(
        Seq((2L, s"$boiler ${filler("v", 12)}")).toDF("doc_id", "text"),
        "doc_id", "text", table, k = 8, batchId = null)
      .as[(Long, Long, Long)].collect()
    oneshot shouldBe Array((2L, 1L, 8L)) // history seen, not crashed/empty
  }

  test("compaction retry after a crash between fold-write and source-delete " +
      "repairs instead of doubling counts") {
    val table = java.nio.file.Files
      .createTempDirectory("graft-span-crash").toString + "/counts"
    val root = new org.apache.hadoop.fs.Path(table)
    Dedup.incrementalDuplicateSpans(
      Seq((1L, s"$boiler ${filler("u", 12)}")).toDF("doc_id", "text"),
      "doc_id", "text", table, k = 8, batchId = "b1").collect()
    Dedup.incrementalDuplicateSpans(
      Seq((2L, s"$boiler ${filler("v", 12)}")).toDF("doc_id", "text"),
      "doc_id", "text", table, k = 8, batchId = "b2").collect()
    val truth = spark.read.schema("fp STRING, cnt BIGINT, batch STRING")
      .parquet(table).groupBy("fp").agg(sum("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

    // crash state 1: completed fold + sources + marker (died before delete)
    spark.read.parquet(s"$table/batch=b1", s"$table/batch=b2")
      .groupBy("fp").agg(sum("cnt").as("cnt"))
      .write.parquet(s"$table/batch=compact-crashed")
    val marker = new org.apache.hadoop.fs.Path(root, "_compact_inflight")
    val out = fs.create(marker, true)
    out.write("batch=compact-crashed\nbatch=b1\nbatch=b2".getBytes("UTF-8"))
    out.close()
    Dedup.compactSpanCounts(spark, table)
    spark.read.schema("fp STRING, cnt BIGINT, batch STRING")
      .parquet(table).groupBy("fp").agg(sum("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap shouldBe truth // NOT doubled
    fs.exists(marker) shouldBe false

    // crash state 2: marker + PARTIAL fold (no _SUCCESS) — rolled back,
    // sources kept, counts unchanged
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, "batch=compact-partial"))
    val out2 = fs.create(marker, true)
    out2.write("batch=compact-partial\nbatch=never-deleted".getBytes("UTF-8"))
    out2.close()
    Dedup.compactSpanCounts(spark, table)
    fs.exists(new org.apache.hadoop.fs.Path(root, "batch=compact-partial")) shouldBe false
    fs.exists(marker) shouldBe false
    spark.read.schema("fp STRING, cnt BIGINT, batch STRING")
      .parquet(table).groupBy("fp").agg(sum("cnt").as("cnt"))
      .as[(String, Long)].collect().toMap shouldBe truth
  }

  test("token conservation: kept = total - dup_tokens for every document") {
    val docs = Seq(
      (1L, s"$boiler india juliet ${filler("u", 12)}"),
      (2L, s"${filler("v", 12)} $boiler india juliet"),
      (3L, s"$boiler ${filler("w", 12)} $boiler"),
      (4L, filler("x", 30))).toDF("doc_id", "text")

    val total = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.size(TextFunctions.words(col("text"))).cast("long").as("n"))
    val dup = Dedup.duplicateSpans(docs, "doc_id", "text", k = 8)
      .select(col("doc_id"), col("dup_tokens"))
    val kept = Dedup.stripDuplicateSpans(docs, "doc_id", "text", k = 8)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(TextFunctions.words(col("text"))).cast("long").as("kept"))

    val joined = total.join(dup, Seq("doc_id"), "left").na.fill(0L)
      .join(kept, Seq("doc_id"))
    joined.where(col("kept") =!= col("n") - col("dup_tokens"))
      .count() shouldBe 0L
  }
}
