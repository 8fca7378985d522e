package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Persisted lexical index: indexed retrieval must EXACTLY equal the
  * one-shot scorer (same integer inputs through the shared tail), appends
  * must fold incrementally (epochs ≡ one-shot over the union), the bucket
  * scan must actually prune partitions, and the streaming maintainer must
  * converge to the batch index.
  */
class LexicalIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def corpus(n: Int) = {
    import spark.implicits._
    (1L to n.toLong).map(i =>
      i -> s"term${i % 7} term${i % 5} term${i % 3} shared filler pad$i")
      .toDF("doc_id", "text")
  }

  private def queriesOf(ids: Long*) = {
    import spark.implicits._
    ids.map(i => i -> Seq(s"term${i % 7}", s"term${i % 5}", "shared"))
      .toDF("query_id", "qterms")
  }

  private def collectRanks(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(r => (r._1, r._2)).toSeq

  test("indexed retrieval exactly equals the one-shot scorer") {
    val docs = corpus(60)
    val q = queriesOf(1L, 2L, 9L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 8)
    val indexed = collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4))
    val oneShot = collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
    indexed shouldBe oneShot
    indexed should not be empty
  }

  test("appended epochs equal one index built over the union") {
    val docs = corpus(50)
    val q = queriesOf(3L, 4L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    // epoch split by parity; append derives nBuckets from the meta table
    LexicalIndex.write(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") % 2 =!= 0),
      "doc_id", "text")
    val incremental = collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5))
    incremental shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
  }

  test("null-text docs leave indexed stats identical to the one-shot " +
      "scorer (N counts them, avgdl skips them)") {
    import spark.implicits._
    val docs = corpus(20).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit(null: String))
        .otherwise(col("text")).as("text"))
    val q = queriesOf(1L, 2L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 8)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
  }

  test("the no-retokenize stats fold (tf sum + no-tokenize doc counts) " +
      "equals the tokenizing formula on null-text, zero-token and " +
      "punctuation-only docs") {
    import spark.implicits._
    // doc_id % 7 == 0 -> null text (n_docs only); % 5 == 0 -> empty
    // string (zero tokens: counts in n_len with length 0, writes no
    // posting rows); % 3 == 0 -> punctuation-only (tokenizes to zero
    // words, same class). The stats row must still match the per-doc
    // sizeOrNull(words(text)) fold exactly.
    val docs = corpus(30).select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit(null: String))
        .when(col("doc_id") % 5 === 0, lit(""))
        .when(col("doc_id") % 3 === 0, lit("... !!! ???"))
        .otherwise(col("text")).as("text"))
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 15),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 15),
      "doc_id", "text")
    val got = spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs"), sum("n_len"), sum("total_len"))
      .first()
    val want = docs.select(graft.functions.TextFunctions
        .sizeOrNull(graft.functions.TextFunctions.words(col("text")))
        .cast("long").as("l"))
      .agg(count(lit(1)), count(col("l")),
        coalesce(sum(col("l")), lit(0L)))
      .first()
    (got.getLong(0), got.getLong(1), got.getLong(2)) shouldBe
      ((want.getLong(0), want.getLong(1), want.getLong(2)))
  }

  test("compaction folds append-accrued files without changing answers") {
    val docs = corpus(40)
    val q = queriesOf(1L, 2L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8)
    for (epoch <- 1 to 3)
      LexicalIndex.append(spark, dir,
        docs.where(col("doc_id") > epoch * 10 && col("doc_id") <= (epoch + 1) * 10),
        "doc_id", "text")
    def files(sub: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub")).count(_.getName.endsWith(".parquet"))
    }
    val before = files("postings") + files("stats")
    val retrievalBefore = collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4))
    val after = LexicalIndex.compact(spark, dir)
    after should be < before
    files("stats") shouldBe 1 // the summed fold is one row, one file
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe retrievalBefore
    // appends keep working after a fold, and a re-fold is idempotent
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 40 - 0),
      "doc_id", "text")
    LexicalIndex.compact(spark, dir)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe retrievalBefore // the extra append matched no docs (empty)
  }

  test("indexed keyword extraction equals the one-shot operator over " +
      "appended epochs") {
    val docs = corpus(30)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") % 2 =!= 0),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).sortBy(r => (r._1, r._2)).toSeq
    rows(LexicalIndex.tfidfKeywordsIndexed(spark, dir, k = 2)) shouldBe
      rows(TextAnalysis.tfidfKeywords(docs, "doc_id", "text", k = 2))
  }

  test("stats deltas written before the n_len column still fold exactly") {
    import spark.implicits._
    val docs = corpus(24)
    val q = queriesOf(1L, 2L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 12),
      "doc_id", "text", dir, nBuckets = 8)
    // simulate a pre-change index generation: rewrite the seed batch's
    // delta WITHOUT n_len (the old schema; its corpora had no null
    // text, so n_len == n_docs held implicitly)
    val old = spark.read.parquet(s"$dir/stats/batch=init")
      .select("n_docs", "total_len").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    old.toDF("n_docs", "total_len").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stats/batch=init")
    // a post-change append adds a new-schema delta into the same dir
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 12),
      "doc_id", "text")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
  }

  test("the indexed scan prunes to the query terms' bucket partitions") {
    val docs = corpus(40)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    // enough buckets that a 1-term query cannot touch them all
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 16)
    // layout v2: postings/batch=<id>/tb=<bucket>/
    val totalBuckets = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("batch="))
      .flatMap(_.listFiles()).count(_.getName.startsWith("tb="))
    totalBuckets should be > 2 // the fixture vocabulary spans buckets

    import spark.implicits._
    val oneTerm = Seq(1L -> Seq("shared")).toDF("query_id", "qterms")
    val out = LexicalIndex.bm25TopKIndexed(
      spark, dir, oneTerm, "query_id", "qterms", k = 3)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val postingScans = scans(out.queryExecution.executedPlan)
      .filter(_.output.exists(_.name == "doc_len"))
    postingScans should not be empty
    val selected = postingScans.map(_.selectedPartitions.partitionCount).max
    withClue(s"selected $selected of $totalBuckets bucket partitions: ") {
      selected shouldBe 1 // one query term -> one bucket directory
    }
    out.collect() should not be empty
  }

  test("replaying an epoch's append is idempotent (no doubled tf/df/N)") {
    val docs = corpus(30)
    val q = queriesOf(5L, 6L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 15),
      "doc_id", "text", dir, nBuckets = 8)
    val epoch = docs.where(col("doc_id") > 15)
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-test-0")
    // a checkpoint replay re-runs the SAME epoch append verbatim — twice
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-test-0")
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-test-0")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
  }

  test("a mid-epoch crash (postings written, stats delta lost) heals on " +
      "the replay") {
    val docs = corpus(24)
    val q = queriesOf(1L, 3L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 12),
      "doc_id", "text", dir, nBuckets = 8)
    val epoch = docs.where(col("doc_id") > 12)
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-crash-1")
    // simulate the crash window: the epoch's stats delta never landed
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(s"$dir/stats/batch=epoch-crash-1"))
    // the replay overwrites the epoch's postings and rewrites its delta
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-crash-1")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
  }

  private def rmrfDir(path: String): Unit = {
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(): Unit
    }
    rmrf(new java.io.File(path))
  }

  private def copyDir(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    java.nio.file.Files.walk(src).forEach { p =>
      val dst = java.nio.file.Paths.get(to).resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(dst)
      else java.nio.file.Files.copy(p, dst): Unit
    }
  }

  test("an epoch replayed AFTER compaction absorbed it is a no-op " +
      "(the folded manifest outlives the epoch directory)") {
    val docs = corpus(30)
    val q = queriesOf(5L, 6L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 15),
      "doc_id", "text", dir, nBuckets = 8)
    val epoch = docs.where(col("doc_id") > 15)
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-fold-0")
    LexicalIndex.compact(spark, dir)
    // the stream restarts from a checkpoint that predates the commit:
    // directory overwrite can't help (batch=epoch-fold-0 is gone), the
    // manifest must make the replay a no-op instead of a double-count
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-fold-0")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
    new java.io.File(s"$dir/postings/batch=epoch-fold-0")
      .exists() shouldBe false
  }

  test("appending under a reserved generation id fails loud and leaves " +
      "the index untouched (a 'compacted' batchId would otherwise " +
      "silently REPLACE the folded corpus)") {
    val docs = corpus(20)
    val q = queriesOf(2L, 4L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 10),
      "doc_id", "text", batchId = "epoch-rsv-0")
    LexicalIndex.compact(spark, dir)
    val before = collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5))
    Seq("compacted", "init").foreach { reserved =>
      intercept[IllegalArgumentException] {
        LexicalIndex.append(spark, dir, docs.limit(3), "doc_id", "text",
          batchId = reserved)
      }
    }
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe before
  }

  test("compact folds the manifest to ONE file so appends stay O(1) " +
      "driver-side, without forgetting any folded epoch") {
    val docs = corpus(40)
    val q = queriesOf(1L, 2L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8)
    // skip the local-FS .crc sidecars Hadoop's own listStatus hides
    def manifestFiles =
      new java.io.File(s"$dir/folded").listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("."))
        .map(_.getName).toSeq
    // three compact cycles, each folding one fresh epoch: without the
    // manifest fold the folded/ dir would hold one file per compact
    for (epoch <- 1 to 3) {
      LexicalIndex.append(spark, dir,
        docs.where(col("doc_id") > epoch * 10 && col("doc_id") <= (epoch + 1) * 10),
        "doc_id", "text", batchId = s"epoch-mf-$epoch")
      LexicalIndex.compact(spark, dir)
    }
    manifestFiles should have size 1
    // the single file still claims every epoch: each replay is a no-op
    for (epoch <- 1 to 3)
      LexicalIndex.append(spark, dir,
        docs.where(col("doc_id") > epoch * 10 && col("doc_id") <= (epoch + 1) * 10),
        "doc_id", "text", batchId = s"epoch-mf-$epoch")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
  }

  test("compact drops a stats-less crash orphan instead of folding it; " +
      "the orphan's replay then appends for real") {
    val docs = corpus(24)
    val q = queriesOf(1L, 3L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 12),
      "doc_id", "text", dir, nBuckets = 8)
    val epoch = docs.where(col("doc_id") > 12)
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-orphan-1")
    // mid-append crash: postings landed, the stats delta did not
    rmrfDir(s"$dir/stats/batch=epoch-orphan-1")
    LexicalIndex.compact(spark, dir)
    // folding the orphan would have baked its postings in WITHOUT its
    // stats; instead the fold must hold exactly the committed seed
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs.where(col("doc_id") <= 12),
        "doc_id", "text", q, "query_id", "qterms", k = 4))
    // the epoch was never manifested as folded, so its replay is a
    // REAL append (a no-op here would silently lose the batch)
    LexicalIndex.append(spark, dir, epoch, "doc_id", "text",
      batchId = "epoch-orphan-1")
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
  }

  test("a mid-compact crash (postings swapped, stats swap lost) keeps " +
      "answering correctly and the next compact recovers") {
    val docs = corpus(30)
    val q = queriesOf(2L, 4L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 15),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 15),
      "doc_id", "text", batchId = "epoch-mc-0")
    val statsBackup = graft.io.Spill.tempDir("graft-lexidx-bak-")
    copyDir(s"$dir/stats", statsBackup)
    LexicalIndex.compact(spark, dir)
    // rewind the stats table to its pre-compact generations: the exact
    // on-disk state of a crash between the two swaps
    rmrfDir(s"$dir/stats")
    copyDir(statsBackup, s"$dir/stats")
    val expected = collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
    // per-epoch deltas and the folded row sum to the same totals
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
    // recovery compact must not require postings∩stats (it is empty
    // here: postings=[compacted], stats=[init, epoch-mc-0])
    LexicalIndex.compact(spark, dir)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
  }

  test("a pre-batch layout fails loud with the rebuild remedy, not a " +
      "raw PATH_NOT_FOUND") {
    val docs = corpus(12)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 4)
    // devolve to the old layout: tb=* buckets directly under postings/
    val init = new java.io.File(s"$dir/postings/batch=init")
    init.listFiles().foreach { f =>
      java.nio.file.Files.move(f.toPath,
        java.nio.file.Paths.get(s"$dir/postings/${f.getName}")): Unit
    }
    rmrfDir(init.toString)
    val e = intercept[IllegalStateException] {
      LexicalIndex.bm25TopKIndexed(spark, dir, queriesOf(1L),
        "query_id", "qterms", k = 3).collect()
    }
    e.getMessage should include("rebuild with LexicalIndex.write")
  }

  test("indexed phrase retrieval exactly equals the one-shot scorer " +
      "(appends included)") {
    import spark.implicits._
    // corpus with real adjacency structure: repeated bigrams, a
    // self-overlapping run, and docs holding both terms NON-adjacent
    val docs = Seq(
      1L -> "alpha beta gamma alpha beta",
      2L -> "alpha x beta alpha y beta",   // both terms, never adjacent
      3L -> "alpha beta alpha beta alpha beta",
      4L -> "a a a a",                      // self-overlap: "a a" x3
      5L -> "gamma delta epsilon",
      6L -> "beta alpha",                   // reversed order only
      7L -> "alpha beta gamma delta"
    ).toDF("doc_id", "text")
    val q = Seq(1L -> "Alpha, Beta!", 2L -> "a a", 3L -> "gamma delta")
      .toDF("query_id", "phrase") // un-normalized phrase normalizes in-plan
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 4), "doc_id", "text",
      dir, nBuckets = 8, positional = true)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 4),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(r => (r._1, r._2)).toSeq
    val indexed = rows(LexicalIndex.phraseTopKIndexed(
      spark, dir, q, "query_id", "phrase", k = 3))
    indexed shouldBe rows(TextAnalysis.phraseTopK(
      docs, "doc_id", "text", q, "query_id", "phrase", k = 3))
    // spot-pin the semantics, not just the equality: self-overlap counts
    // every start, non-adjacent docs are absent, counts rank the order
    indexed.filter(_._1 == 2L).map(r => (r._3, r._4)) shouldBe Seq((4L, 3L))
    indexed.filter(_._1 == 1L).map(_._3) should contain(3L)
    indexed.filter(_._1 == 1L).map(_._3) should not contain 2L
    indexed.filter(_._1 == 1L).map(_._3) should not contain 6L
    // compaction preserves the position lists (the fold rewrites every
    // posting column, pos included)
    LexicalIndex.compact(spark, dir)
    rows(LexicalIndex.phraseTopKIndexed(
      spark, dir, q, "query_id", "phrase", k = 3)) shouldBe indexed
    // the phrase path's posting scan prunes on the tb partition column
    // exactly like the bm25 one (phraseTopKIndexed runs its rank tail
    // through an eager spill, so pin the pruned READ it issues — the
    // same readPostings + isin filter — rather than the returned plan,
    // which scans the spilled counts)
    import spark.implicits._
    val prunedRead = spark.read.option("basePath", s"$dir/postings")
      .parquet(s"$dir/postings/batch=*")
      .where(col("tb").isin(3))
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val postingScans = scans(prunedRead.queryExecution.executedPlan)
    postingScans should not be empty
    val total = new java.io.File(s"$dir/postings").listFiles()
      .filter(_.getName.startsWith("batch="))
      .flatMap(_.listFiles()).count(_.getName.startsWith("tb="))
    total should be > 1 // the fixture vocabulary spans buckets
    val selected = postingScans.map(_.selectedPartitions.partitionCount).max
    withClue(s"selected $selected of $total bucket partitions: ") {
      selected should be <= 1 // one bucket value -> at most one directory
    }
  }

  test("indexed proximity retrieval exactly equals the one-shot scorer, " +
      "with hand-checked spans") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha beta",                     // span 1
      2L -> "alpha x y z beta",               // span 4 > slop 3
      3L -> "beta q alpha",                   // span 2 (order-free)
      4L -> "alpha b c d e f g h i j beta",   // span 10, well out
      5L -> "gamma delta",
      6L -> "alpha alpha beta alpha"          // min span 1
    ).toDF("doc_id", "text")
    // un-normalized terms normalize in-plan; "alpha alpha" dedups to a
    // single-term containment query (span 0); zebra never occurs
    val q = Seq(1L -> "Alpha, Beta!", 2L -> "alpha alpha",
      3L -> "gamma zebra").toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 3), "doc_id", "text",
      dir, nBuckets = 8, positional = true)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 3),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(r => (r._1, r._2)).toSeq
    val indexed = rows(LexicalIndex.proximityTopKIndexed(
      spark, dir, q, "query_id", "qterms", slop = 3, k = 10))
    indexed shouldBe rows(TextAnalysis.proximityTopK(
      docs, "doc_id", "text", q, "query_id", "qterms", slop = 3, k = 10))
    // spans rank tightest-first with the ascending-doc-id tiebreak;
    // out-of-slop and absent-term docs are gone
    indexed.filter(_._1 == 1L)
      .map(r => (r._2, r._3, r._4)) shouldBe Seq(
      (1L, 1L, 1L), (2L, 6L, 1L), (3L, 3L, 2L))
    // the deduped single-term query is containment, span 0, every doc
    // holding the term, doc-id order
    indexed.filter(_._1 == 2L)
      .map(r => (r._2, r._3, r._4)) shouldBe Seq(
      (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), (4L, 4L, 0L), (5L, 6L, 0L))
    indexed.filter(_._1 == 3L) shouldBe empty
    // proximity needs positions: a count-only index fails loud
    val cdir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", cdir, nBuckets = 8)
    val e = intercept[IllegalStateException] {
      LexicalIndex.proximityTopKIndexed(spark, cdir, q, "query_id",
        "qterms", slop = 3, k = 10)
    }
    e.getMessage should include("not a positional index")
  }

  test("indexed passage retrieval exactly equals the one-shot scorer, " +
      "with hand-checked windows") {
    import spark.implicits._
    val docs = Seq(
      // best 4-window: positions 5..7 hold alpha beta alpha -> 3 hits
      // starting at 5 (the earlier pair at 0,2 only counts 2)
      1L -> "alpha x alpha c d alpha beta alpha",
      2L -> "alpha beta",                  // 2 hits at 0
      3L -> "beta e f g h alpha",          // windows never span both
      4L -> "gamma delta",
      5L -> "beta beta beta beta"          // 4 hits at 0
    ).toDF("doc_id", "text")
    val q = Seq(1L -> "Alpha, Beta!", 2L -> "beta beta", 3L -> "zebra")
      .toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 2), "doc_id", "text",
      dir, nBuckets = 8, positional = true)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 2),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(r => (r._1, r._2)).toSeq
    val indexed = rows(LexicalIndex.passageTopKIndexed(
      spark, dir, q, "query_id", "qterms", window = 4, k = 10))
    indexed shouldBe rows(TextAnalysis.passageTopK(
      docs, "doc_id", "text", q, "query_id", "qterms", window = 4, k = 10))
    // (query, rank, doc, n_hits, start): density ranks docs, the
    // winning window's start comes back, singleton matches still rank
    // (doc 5's beta run scores 4 for {alpha, beta} too — occurrences,
    // not distinct terms, are the density measure)
    indexed.filter(_._1 == 1L) shouldBe Seq(
      (1L, 1L, 5L, 4L, 0L), (1L, 2L, 1L, 3L, 5L), (1L, 3L, 2L, 2L, 0L),
      (1L, 4L, 3L, 1L, 0L))
    // dedup to {beta}: doc 5's run of 4 wins; doc 3 has one beta
    indexed.filter(_._1 == 2L) shouldBe Seq(
      (2L, 1L, 5L, 4L, 0L), (2L, 2L, 1L, 1L, 6L), (2L, 3L, 2L, 1L, 1L),
      (2L, 4L, 3L, 1L, 0L))
    indexed.filter(_._1 == 3L) shouldBe empty
    // passage retrieval needs positions: a count-only index fails loud
    val cdir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", cdir, nBuckets = 8)
    intercept[IllegalStateException] {
      LexicalIndex.passageTopKIndexed(spark, cdir, q, "query_id",
        "qterms", window = 4, k = 10)
    }.getMessage should include("not a positional index")
  }

  test("indexed fuzzy BM25 exactly equals the one-shot scorer and the " +
      "corrected exact query") {
    import spark.implicits._
    val docs = Seq(
      1L -> "table table chair",
      2L -> "table lamp desk",
      3L -> "sofa lamp rug",
      4L -> "chair chairs rug"  // chairs: insert-typo neighbor of chair
    ).toDF("doc_id", "text")
    val q = Seq(1L -> Seq("tabl"), 2L -> Seq("chair"), 3L -> Seq("zzzzz"))
      .toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 2), "doc_id", "text",
      dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 2),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(r => (r._1, r._2)).toSeq
    val indexed = rows(LexicalIndex.bm25TopKFuzzyIndexed(
      spark, dir, q, "query_id", "qterms", k = 4))
    indexed shouldBe rows(TextAnalysis.bm25TopKFuzzy(
      docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
    // "tabl" ranks exactly like the corrected single-term query...
    rows(LexicalIndex.bm25TopKIndexed(spark, dir,
        Seq(1L -> Seq("table")).toDF("query_id", "qterms"),
        "query_id", "qterms", k = 4)) shouldBe
      indexed.filter(_._1 == 1L)
    // ...while "chair" ALSO pulls its insert-neighbor "chairs" (doc 4
    // scores on both), and the unknown term returns nothing
    indexed.filter(_._1 == 2L).map(_._3) should contain(4L)
    indexed.filter(_._1 == 3L) shouldBe empty
  }

  test("phrase retrieval on a non-positional index fails loud; BM25 on " +
      "a positional index still matches the one-shot scorer") {
    import spark.implicits._
    val docs = corpus(30)
    val qPhrase = Seq(1L -> "shared filler").toDF("query_id", "phrase")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 8)
    val e = intercept[IllegalStateException] {
      LexicalIndex.phraseTopKIndexed(spark, dir, qPhrase, "query_id",
        "phrase", k = 3)
    }
    e.getMessage should include("not a positional index")
    // a positional index serves BOTH phrase and BM25 queries (the pos
    // column prunes away at the parquet scan for the latter)
    val pdir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", pdir, nBuckets = 8,
      positional = true)
    val q = queriesOf(1L, 2L, 9L)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, pdir, q, "query_id", "qterms", k = 4)
    ) shouldBe collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 4))
    LexicalIndex.phraseTopKIndexed(spark, pdir, qPhrase, "query_id",
      "phrase", k = 3).collect() should not be empty
  }

  test("an empty-after-tokenization phrase fails loud on both paths") {
    import spark.implicits._
    val docs = corpus(10)
    val q = Seq(1L -> "!!!").toDF("query_id", "phrase")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 4,
      positional = true)
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseTopK(docs, "doc_id", "text", q, "query_id",
        "phrase", k = 2)
    }
    intercept[IllegalArgumentException] {
      LexicalIndex.phraseTopKIndexed(spark, dir, q, "query_id", "phrase",
        k = 2)
    }
  }

  test("indexed significant terms exactly equal the one-shot operator " +
      "(appends included)") {
    import spark.implicits._
    val docs = corpus(40)
    val q = Seq(1L -> "term1 shared", 2L -> "term3").toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 20),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 20),
      "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2)).toSeq
    val indexed = rows(LexicalIndex.significantTermsIndexed(spark, dir,
      q, "query_id", "qterms", k = 4))
    indexed shouldBe rows(TextAnalysis.significantTerms(docs, "doc_id",
      "text", q, "query_id", "qterms", k = 4))
    indexed should not be empty
  }

  test("describe reports layout, generations, folded batches and " +
      "corpus totals across build/append/compact") {
    val docs = corpus(20)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8, positional = true)
    val d0 = LexicalIndex.describe(spark, dir)
    d0.nBuckets shouldBe 8
    d0.positional shouldBe true
    d0.postingGenerations shouldBe Seq("init")
    d0.foldedBatches shouldBe 0
    d0.nDocs shouldBe 10L
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 10),
      "doc_id", "text", batchId = "epoch-d-1")
    val d1 = LexicalIndex.describe(spark, dir)
    d1.postingGenerations shouldBe Seq("epoch-d-1", "init")
    d1.nDocs shouldBe 20L
    d1.parquetFiles should be > d0.parquetFiles
    LexicalIndex.compact(spark, dir)
    val d2 = LexicalIndex.describe(spark, dir)
    d2.postingGenerations shouldBe Seq("compacted")
    d2.statsGenerations shouldBe Seq("compacted")
    d2.foldedBatches shouldBe 2 // init + the epoch, both manifested
    d2.nDocs shouldBe 20L
    d2.totalLen shouldBe d1.totalLen // the fold moves bytes, not stats
    d2.parquetFiles should be < d1.parquetFiles
  }

  test("indexed more-like-this exactly equals the one-shot operator " +
      "(appends included): seed text from the corpus, idf and ranking " +
      "from the index") {
    import spark.implicits._
    val docs = corpus(40)
    val seeds = Seq(5L, 12L, 30L).toDF("doc_id")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 20),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 20),
      "doc_id", "text")
    val indexed = collectRanks(LexicalIndex.moreLikeThisIndexed(
      spark, dir, docs, "doc_id", "text", seeds, "doc_id",
      mTerms = 3, k = 4))
    indexed shouldBe collectRanks(TextAnalysis.moreLikeThis(
      docs, "doc_id", "text", seeds, "doc_id", mTerms = 3, k = 4))
    indexed should not be empty
    indexed.map(_._1).distinct.sorted shouldBe Seq(5L, 12L, 30L)
    // the seed never appears in its own result list
    indexed.foreach { case (q, _, d) => d should not be q }
  }

  test("indexed boolean BM25 exactly equals the one-shot operator " +
      "(appends included), and unsatisfiable queries yield no rows") {
    import spark.implicits._
    val docs = corpus(40)
    val q = Seq(
      (1L, Seq("term1"), Seq("shared"), Seq.empty[String]),
      (2L, Seq.empty[String], Seq("term2", "shared"), Seq("term3")),
      (3L, Seq("term1", "term2"), Seq.empty[String], Seq.empty[String]),
      (4L, Seq("nosuchterm"), Seq("shared"), Seq.empty[String]))
      .toDF("query_id", "must", "should", "mustNot")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 20),
      "doc_id", "text", dir, nBuckets = 8)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 20),
      "doc_id", "text")
    val indexed = collectRanks(LexicalIndex.bm25TopKBoolIndexed(
      spark, dir, q, "query_id", "must", "should", "mustNot", k = 5))
    indexed shouldBe collectRanks(TextAnalysis.bm25TopKBool(
      docs, "doc_id", "text", q, "query_id", "must", "should",
      "mustNot", k = 5))
    indexed should not be empty
    indexed.map(_._1).distinct should not contain 4L // unmatched must
  }

  test("indexed facet counts exactly equal the one-shot operator " +
      "(appends and null facets included), and the scan prunes") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i,
        s"term${i % 7} term${i % 5} shared pad$i",
        if (i % 11 == 0) null else s"lang${i % 3}"))
      .toDF("doc_id", "text", "lang")
    val q = Seq(1L -> "term1 shared", 2L -> "term2", 3L -> "zebra")
      .toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 20),
      "doc_id", "text", dir, nBuckets = 16)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 20),
      "doc_id", "text")
    def collectFacets(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
        r.getLong(2))).sortBy(t => (t._1, t._2)).toSeq
    val indexed = LexicalIndex.facetCountsIndexed(spark, dir, q,
      "query_id", "qterms", docs, "doc_id", "lang")
    collectFacets(indexed) shouldBe collectFacets(
      TextAnalysis.facetCounts(docs, "doc_id", "text", q, "query_id",
        "qterms", "lang"))
    collectFacets(indexed) should not be empty
    // the posting scan touches only the query terms' buckets — the
    // facet join must not force a full index read
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val oneTerm = Seq(1L -> "shared").toDF("query_id", "qterms")
    val pruned = LexicalIndex.facetCountsIndexed(spark, dir, oneTerm,
      "query_id", "qterms", docs, "doc_id", "lang")
    // the facet projection prunes doc_len/tf away, so identify the
    // posting scan by its tb partition column instead
    val postingScans = scans(pruned.queryExecution.executedPlan)
      .filter(_.relation.partitionSchema.fieldNames.contains("tb"))
    postingScans should not be empty
    // one query term -> one bucket per generation (write + one append
    // = 2 leaf partitions; an unpruned scan would touch ~16 buckets)
    postingScans.map(_.selectedPartitions.partitionCount).max should be <= 2
  }

  test("indexed passage snippets exactly equal the one-shot operator " +
      "(the ranking comes from the index, the text from the corpus)") {
    import spark.implicits._
    val docs = corpus(30)
    val q = Seq(2L -> "term2 shared", 5L -> "term5 filler")
      .toDF("query_id", "qterms")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 15),
      "doc_id", "text", dir, nBuckets = 8, positional = true)
    LexicalIndex.append(spark, dir, docs.where(col("doc_id") > 15),
      "doc_id", "text")
    def collectSnips(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
        .sortBy(t => (t._1, t._2)).toSeq
    val indexed = collectSnips(LexicalIndex.passageSnippetsIndexed(
      spark, dir, docs, "doc_id", "text", q, "query_id", "qterms",
      window = 4, k = 5))
    indexed shouldBe collectSnips(TextAnalysis.passageSnippets(
      docs, "doc_id", "text", q, "query_id", "qterms", window = 4, k = 5))
    indexed should not be empty
    indexed.foreach { case (_, _, _, _, _, snippet) =>
      snippet.split(" ").length should be <= 4
    }
  }

  test("ZERO queries degrade to zero rows on both phrase paths (not an " +
      "empty-reduce crash)") {
    import spark.implicits._
    val docs = corpus(10)
    val q = Seq.empty[(Long, String)].toDF("query_id", "phrase")
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 4,
      positional = true)
    val oneShot = TextAnalysis.phraseTopK(docs, "doc_id", "text", q,
      "query_id", "phrase", k = 2)
    oneShot.columns.toSeq shouldBe Seq("query_id", "rank", "doc_id", "n_hits")
    oneShot.count() shouldBe 0L
    LexicalIndex.phraseTopKIndexed(spark, dir, q, "query_id", "phrase",
      k = 2).count() shouldBe 0L
  }

  test("querying or appending a non-index path fails loud") {
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/nothere"
    val q = queriesOf(1L)
    val e = intercept[IllegalStateException] {
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 1)
    }
    e.getMessage should include("not a lexical index")
  }

  test("maintain auto-compacts when generations hit the threshold — " +
      "exactly once at the crossing, and a replayed epoch the fold " +
      "absorbed still no-ops") {
    import spark.implicits._
    val docs = corpus(40)
    val q = queriesOf(1L, 2L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8)
    val rows = docs.where(col("doc_id") > 10)
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = LexicalIndex.maintain(spark, dir,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", checkpoint(),
      compactAfterGenerations = 3)
    def gens = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).sorted.toSeq
    // epoch 0: init + epoch-0 = 2 generations, below the threshold
    input.addData(rows.take(10).toIndexedSeq)
    query.processAllAvailable()
    gens should have size 2
    // epoch 1 crosses the threshold (3 generations) -> ONE fold back
    // to batch=compacted
    input.addData(rows.slice(10, 20).toIndexedSeq)
    query.processAllAvailable()
    gens shouldBe Seq("batch=compacted")
    // epoch 2 lands at 2 generations: no re-trigger below the threshold
    input.addData(rows.drop(20).toIndexedSeq)
    query.processAllAvailable()
    query.stop()
    val epochGens = gens.filter(_.startsWith("batch=epoch-"))
    epochGens should have size 1
    val expected = collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
    // a restart replaying epoch 1 — whose directory the auto-compact
    // consumed — must no-op via the folded manifest, not double-count
    val replayed = epochGens.head.stripPrefix("batch=")
      .replaceAll("-2$", "-1")
    LexicalIndex.append(spark, dir,
      rows.slice(10, 20).toIndexedSeq.toDF("doc_id", "text"),
      "doc_id", "text", batchId = replayed)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
  }

  test("streaming maintenance converges to the batch-built index") {
    import spark.implicits._
    val docs = corpus(30)
    val q = queriesOf(5L, 6L)
    val dir = graft.io.Spill.tempDir("graft-lexidx-") + "/idx"
    // seed with the first third, stream the rest in two micro-batches
    LexicalIndex.write(docs.where(col("doc_id") <= 10),
      "doc_id", "text", dir, nBuckets = 8)
    val rows = docs.where(col("doc_id") > 10)
      .as[(Long, String)].collect().sortBy(_._1)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val query = LexicalIndex.maintain(spark, dir,
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", checkpoint())
    input.addData(rows.take(10).toIndexedSeq)
    query.processAllAvailable()
    input.addData(rows.drop(10).toIndexedSeq)
    query.processAllAvailable()
    query.stop()
    val expected = collectRanks(
      TextAnalysis.bm25TopK(docs, "doc_id", "text", q, "query_id", "qterms", k = 5))
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
    // kill-and-restart replay: a recovering stream re-runs its LAST
    // epoch's foreachBatch with the same epoch id — maintain keys the
    // append's batch= directory on it, so the replay overwrites instead
    // of double-appending. Replay epoch 1 (the second micro-batch)
    // verbatim and pin the ranking unchanged.
    val epochIds = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("batch=epoch-")).sorted
    epochIds should have size 2
    val lastEpoch = epochIds.last.stripPrefix("batch=")
    LexicalIndex.append(spark, dir,
      rows.drop(10).toIndexedSeq.toDF("doc_id", "text"),
      "doc_id", "text", batchId = lastEpoch)
    collectRanks(
      LexicalIndex.bm25TopKIndexed(spark, dir, q, "query_id", "qterms", k = 5)
    ) shouldBe expected
  }
}
