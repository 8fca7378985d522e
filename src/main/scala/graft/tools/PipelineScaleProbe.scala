package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}

/** Scale probe for the two heaviest COMPOSED battery plans (SURVEY §9
  * evidence): the sf0.1 corpus duplicated 1x/2x/5x/10x (ids offset),
  * timing
  *
  *  - the q90 pipeline (TrainingData.clean -> Chunking.chunk ->
  *    Packing.packGreedy) — at 10x the cleaning stages' gated id sets
  *    (dedup survivors, near-dup components, df-capped postings) grow
  *    past comfortable broadcast sizes, so the probe confirms the
  *    12-exchange budget holds when AQE plans those joins as shuffles
  *    instead; and
  *  - the q112 policy semantic dedup (Dedup.semanticDedupBy) — ID-offset
  *    duplication is the ADVERSARIAL case here: every copy of a vector
  *    is an exact cosine-1.0 neighbor of every other copy, so each
  *    near-dup cluster of size k becomes size m*k and the block-keyed
  *    pair join emits ~m^2 the pairs, stressing the pointer-jumping
  *    component loop and the keeper aggregate far harder than organic
  *    growth would.
  *
  * Every stage in both plans is linear-or-pair-bounded by construction;
  * super-linear wall-clock beyond the m^2 pair growth in q112 would mean
  * a join degraded to nested-loop or a component iteration stopped
  * converging — the regressions `PlanAuditSpec`'s ceilings cannot see at
  * sf0.001.
  */
object PipelineScaleProbe {
  def main(args: Array[String]): Unit = {
    // optional section filter: any of "q90", "q112", "q119", "q123",
    // "q130" (default all)
    val sections: Set[String] =
      if (args.isEmpty) Set("q90", "q112", "q119", "q123", "q130") else args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-pipeline-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")).cache()
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).cache()
    val (nDocs, nVecs) = (docs.count(), embs.count())

    if (sections("q90")) Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars")))
        .reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val survivors = graft.pipelines.TrainingData.clean(corpus, "doc_id", "text")
        .select(col("doc_id"))
      val chunks = graft.operators.Chunking.chunk(
        survivors.join(corpus.select(col("doc_id"), col("text")), Seq("doc_id")),
        "doc_id", "text", size = 24, stride = 24)
        .select((col("doc_id") * 1000000L + col("chunk_id")).as("cid"),
          (col("doc_id") % 4).as("shard"), col("n_tokens").as("tokens"))
      val packed = graft.operators.Packing.packGreedy(
        chunks, "cid", "tokens", "shard", budget = 96L)
        .agg(count(lit(1)), countDistinct(col("seq_id"))).head()
      val prepSecs = (System.nanoTime() - t0) / 1e9
      println(f"q90 m=$m%d docs=${m * nDocs}%d chunks=${packed.getLong(0)}%d " +
        f"seqs=${packed.getLong(1)}%d secs=$prepSecs%.2f")
      graft.io.Spill.releaseAll()
    }

    if (sections("q112")) Seq(1, 2, 5, 10).foreach { m =>
      val vecs = (0 until m).map(i => embs.select(
        (col("vec_id") + lit(i * 10_000_000L)).as("vec_id"),
        col("label"), col("embedding"))).reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val kept = graft.operators.Dedup.semanticDedupBy(vecs,
          "vec_id", "embedding", blockCol = "label", threshold = 0.4,
          priority = col("vec_id") % 7)
        .agg(count(lit(1))).head().getLong(0)
      val dedupSecs = (System.nanoTime() - t0) / 1e9
      println(f"q112 m=$m%d vecs=${m * nVecs}%d kept=$kept%d secs=$dedupSecs%.2f")
      graft.io.Spill.releaseAll()
    }

    // q119 domain-cap ADVERSARIAL skew probe: ONE domain holds 50% of the
    // corpus (the mega-host case the plan split exists for). The bounded
    // TopKAggregator gate should scale ~linearly in total rows — partial
    // buffers cap the mega-domain's exchange at k ids per map task —
    // while the row_number window form funnels the whole mega-domain
    // into one task's sort, so its wall diverges with m.
    if (sections("q119")) Seq(1, 2, 5, 10).foreach { m =>
      val n = m * 1_000_000L
      val rows = spark.range(n).select(col("id"),
        when(col("id") % 2 === 0, lit("https://mega.example.com/x"))
          .otherwise(concat(lit("https://site"),
            (col("id") % 50000).cast("string"), lit(".example.net/y")))
          .as("url"))
      val t0 = System.nanoTime()
      val kept = graft.operators.Urls.domainGate(rows, "url", "id",
        maxPerDomain = 40).agg(count(lit(1))).head().getLong(0)
      val aggSecs = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val keptW = { // the pre-round-10 window form, for comparison
        val keyed = graft.operators.Urls.withDomain(rows, "url")
          .withColumn("__dk", coalesce(col("domain"), lit("-")))
        keyed.withColumn("__rn", org.apache.spark.sql.functions.row_number()
            .over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("__dk")).orderBy(col("id"))))
          .where(col("__rn") <= 40)
          .agg(count(lit(1))).head().getLong(0)
      }
      val winSecs = (System.nanoTime() - t1) / 1e9
      println(f"q119 m=$m%d rows=$n%d kept=$kept%d keptW=$keptW%d " +
        f"aggSecs=$aggSecs%.2f windowSecs=$winSecs%.2f")
    }

    // q123 NB-classify probe: fit ONCE (the deployment shape — a
    // persisted model), score corpora duplicated 1x/2x/5x/10x. Scoring
    // is explode x L labels + one vocab equi-join + two bounded
    // aggregates, so wall must track rows ~linearly; super-linear growth
    // would mean the label broadcast degraded to a shuffle or the argmax
    // aggregate stopped combining map-side.
    if (sections("q123")) {
      val toks = docs.select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.words(col("text")).as("w"))
      val model = graft.io.Spill(graft.operators.NaiveBayes.train(
        toks.where(col("doc_id") % 2 === 0), "lang", "w"), "graft-nbp-")
      Seq(1, 2, 5, 10).foreach { m =>
        val test = (0 until m).map(i => toks.select(
          (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"), col("w")))
          .reduce(_ unionAll _)
        val t0 = System.nanoTime()
        val n = graft.operators.NaiveBayes.classify(test, "doc_id", "w", model)
          .agg(count(lit(1))).head().getLong(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"q123 m=$m%d docs=$n%d secs=$secs%.2f")
      }
      graft.io.Spill.releaseAll()
    }

    // q130 DSIR probe: the target model is fixed-size by construction
    // (256 buckets regardless of corpus), so weighting corpora
    // duplicated 1x/2x/5x/10x must track rows ~linearly — the stages
    // are one explode+md5 pass into the spill, two bucket aggregates
    // whose exchange is capped at 256 rows per map task, the broadcast
    // ratio join, and one doc-keyed sum. Super-linear growth would mean
    // the ratio broadcast degraded to a shuffle or the per-doc aggregate
    // stopped combining map-side.
    if (sections("q130")) Seq(1, 2, 5, 10).foreach { m =>
      // filter on the ORIGINAL id BEFORE shifting: the copies must all be
      // the same raw slice (and stay disjoint from the target slice) or
      // the probe would score target-contaminated corpora of varying
      // composition instead of true duplicates
      val raw = (0 until m).map(i => docs
        .where(col("doc_id") % 7 =!= 0)
        .select((col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
          col("text"))).reduce(_ unionAll _)
      val target = docs.where(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("text"))
      val t0 = System.nanoTime()
      val n = graft.operators.Dsir.importanceWeights(
          raw, target, "doc_id", "text", buckets = 256, salt = "dsir")
        .agg(count(lit(1))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"q130 m=$m%d docs=$n%d secs=$secs%.2f")
      graft.io.Spill.releaseAll()
    }
    spark.stop()
  }
}
