package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token columns — the in-engine TRAINABLE
  * classifier the C4/fastText-style quality and language filters run at
  * corpus scale. Two properties make it the right first classifier for
  * a SQL-native engine:
  *
  *   - TRAINING IS COUNTING: the fit is one exploded hash aggregate plus
  *     two tiny rollups — fully declarative, no iterative optimizer —
  *     so an external engine replays the training bit for bit (q123's
  *     DuckDB oracle re-derives the model AND the predictions), and the
  *     fit scales exactly like a word count;
  *   - THE MODEL IS A TABLE: (kind, label, token, logp) rows. Deploying
  *     a classifier is a parquet write; scoring joins it like any other
  *     dimension; model diffs/rollbacks are table diffs.
  *
  * Log-probabilities round to 6 decimals at train time and scores to 4
  * at classify time — the battery's cross-engine determinism pin (`ln`
  * may differ in the last ulp across engines; the rounding absorbs it).
  *
  * Scale shape: train = explode + one (label, token) hash aggregate
  * (shuffles counts, never text) + label-sized rollups; classify =
  * explode, a broadcast of the L-row label table, one equi-join against
  * the vocabulary-sized cond table, and two bounded aggregates. Nothing
  * is driver-held — L, V, and corpus size all stay distributed.
  */
object NaiveBayes {

  /** Fit on `(labelCol, tokensCol)` rows; Laplace smoothing `alpha`.
    *
    * Returns the model table, kind ∈:
    *   - `prior`: log P(label) — one row per label, token NULL;
    *   - `cond`: log P(token | label) = ln((c + alpha)/(t_l + alpha*V));
    *   - `default`: the unseen-token mass ln(alpha/(t_l + alpha*V)) —
    *     one row per label, token NULL.
    */
  def train(docs: DataFrame, labelCol: String, tokensCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val base = docs.select(col(labelCol).cast("string").as("label"),
      col(tokensCol).as("__toks"))
    modelFromCounts(
      base.groupBy(col("label")).agg(count(lit(1)).as("__docs")),
      base.select(col("label"), explode(col("__toks")).as("token"))
        .groupBy(col("label"), col("token"))
        .agg(count(lit(1)).as("__c")),
      alpha)
  }

  /** The model arithmetic over already-aggregated counts — shared by
    * [[train]] (counts from one corpus pass) and [[trainIncremental]]
    * (counts folded across batch dirs). Counting is ASSOCIATIVE, so the
    * two entry points produce IDENTICAL models for the same underlying
    * docs (spec-pinned).
    */
  private def modelFromCounts(docCounts: DataFrame, tokCounts: DataFrame,
      alpha: Double): DataFrame = {
    val nDocs = docCounts.agg(sum(col("__docs")).as("__n"))
    val priors = docCounts
      .crossJoin(broadcast(nDocs))
      .select(col("label"), lit(null).cast("string").as("token"),
        round(log(col("__docs") / col("__n")), 6).as("logp"),
        lit("prior").as("kind"))
    // totals anchor on the PRIOR label set, not the token counts: a
    // label whose training docs are all token-free still needs its
    // default row (ln(alpha/(0 + alpha*V))) — otherwise classify's
    // label table would silently drop it and an empty test doc could
    // argmax a different label than the all-priors rule
    val totals = docCounts.select(col("label"))
      .join(tokCounts.groupBy(col("label")).agg(sum(col("__c")).as("__t")),
        Seq("label"), "left")
      .select(col("label"), coalesce(col("__t"), lit(0L)).as("__t"))
    // fail loud on a token-free corpus: V=0 with t=0 makes the default
    // row's ln(alpha/(0 + alpha*0)) a division by zero, which non-ANSI
    // Spark folds to a silent NULL logp that propagates to NULL classify
    // scores. Guard at the point of use (plan-level — no extra action).
    val vocab = tokCounts.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v0"))
      .select(when(col("__v0") === 0, raise_error(lit(
          "NaiveBayes: empty vocabulary after counting — every training " +
            "doc is token-free; a token-free corpus is unsupported")))
        .otherwise(col("__v0")).cast("long").as("__v"))
    val conds = tokCounts.join(totals, Seq("label"))
      .crossJoin(broadcast(vocab))
      .select(col("label"), col("token"),
        round(log((col("__c") + lit(alpha)) /
          (col("__t") + lit(alpha) * col("__v"))), 6).as("logp"),
        lit("cond").as("kind"))
    val defaults = totals.crossJoin(broadcast(vocab))
      .select(col("label"), lit(null).cast("string").as("token"),
        round(log(lit(alpha) / (col("__t") + lit(alpha) * col("__v"))), 6)
          .as("logp"),
        lit("default").as("kind"))
    priors.unionByName(conds).unionByName(defaults)
  }

  /** Cross-run training — the model-maintenance member of the
    * incremental family: because the fit is counting and counting is
    * associative, the incremental model is EXACT, not approximate —
    * training batch-by-batch produces the identical model table to
    * [[train]] over the union of all batches (spec-pinned equality).
    * Each call appends this batch's count rows (kind `doc`: docs per
    * label; kind `tok`: (label, token) occurrences) to
    * `countsTablePath/batch=<id>` and returns the model derived from
    * ALL counts (history + this batch).
    *
    * Same retry discipline as the incremental dedup tables: the history
    * read EXCLUDES the in-flight `batch=<id>` (a replayed batch never
    * double-counts its own first attempt), the batch counts spill
    * before the write, and the write is an idempotent overwrite of the
    * batch dir. The accumulating dirs fold with [[compactCounts]]
    * (summed — the additive `BatchTable` fold).
    */
  def trainIncremental(docs: DataFrame, labelCol: String, tokensCol: String,
      countsTablePath: String, batchId: String = null,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val spark = docs.sparkSession
    val bid = Option(batchId).getOrElse(
      "oneshot-" + java.util.UUID.randomUUID().toString.take(12))
    val base = docs.select(col(labelCol).cast("string").as("label"),
      col(tokensCol).as("__toks"))
    val batchCounts = graft.io.Spill(
      base.groupBy(col("label")).agg(count(lit(1)).as("c"))
        .select(lit("doc").as("kind"), col("label"),
          lit(null).cast("string").as("token"), col("c"))
        .unionByName(
          base.select(col("label"), explode(col("__toks")).as("token"))
            .groupBy(col("label"), col("token"))
            .agg(count(lit(1)).as("c"))
            .select(lit("tok").as("kind"), col("label"), col("token"),
              col("c"))),
      "graft-nbc-")
    val hist =
      try spark.read
        .schema("kind STRING, label STRING, token STRING, c BIGINT, batch STRING")
        .parquet(countsTablePath)
        .where(col("batch") =!= bid)
        .select(col("kind"), col("label"), col("token"), col("c"))
      catch { case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PATH_NOT_FOUND" =>
        spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL(
            "kind STRING, label STRING, token STRING, c BIGINT"))
      }
    val all = hist.unionByName(batchCounts)
    val model = modelFromCounts(
      all.where(col("kind") === "doc")
        .groupBy(col("label")).agg(sum(col("c")).as("__docs")),
      all.where(col("kind") === "tok")
        .groupBy(col("label"), col("token")).agg(sum(col("c")).as("__c")),
      alpha)
    batchCounts.write.mode("overwrite").parquet(s"$countsTablePath/batch=$bid")
    model
  }

  /** Fold the [[trainIncremental]] count table's batch dirs (summed per
    * (kind, label, token) — the additive fold, with the span-count crash
    * discipline).
    */
  def compactCounts(spark: org.apache.spark.sql.SparkSession,
      countsTablePath: String, excludeBatch: String = null,
      targetFileBytes: Long = 128L << 20): Int =
    graft.io.BatchTable.compactSumFold(spark, countsTablePath,
      Seq("kind", "label", "token"), "c", excludeBatch, targetFileBytes)

  /** Score every doc against every label and keep the argmax:
    * `score(label) = prior + Σ_token cond(label, token | default)`,
    * rounded to 4 decimals; ties break to the lexicographically smallest
    * label (deterministic, oracle-replayable). Docs with an empty or
    * NULL token array score on priors alone. Returns
    * (idCol, label, score).
    */
  def classify(docs: DataFrame, idCol: String, tokensCol: String,
      model: DataFrame): DataFrame = {
    val labels = broadcast(
      model.where(col("kind") === "prior")
        .select(col("label"), col("logp").as("__prior"))
        .join(model.where(col("kind") === "default")
          .select(col("label"), col("logp").as("__default")), Seq("label")))
    val conds = model.where(col("kind") === "cond")
      .select(col("label"), col("token"), col("logp").as("__cond"))
    val scored = docs
      .select(col(idCol), explode(col(tokensCol)).as("token"))
      .crossJoin(labels)
      .join(conds, Seq("label", "token"), "left")
      .groupBy(col(idCol), col("label"), col("__prior"))
      .agg(sum(coalesce(col("__cond"), col("__default"))).as("__s"))
      .select(col(idCol), col("label"),
        round(col("__prior") + col("__s"), 4).as("score"))
    val empties = docs
      .where(col(tokensCol).isNull || size(col(tokensCol)) === 0)
      .select(col(idCol)).crossJoin(labels)
      .select(col(idCol), col("label"),
        round(col("__prior"), 4).as("score"))
    scored.unionByName(empties)
      .groupBy(col(idCol))
      .agg(min_by(struct(col("label"), col("score")),
        struct(-col("score"), col("label"))).as("__b"))
      .select(col(idCol), col("__b.label").as("label"),
        col("__b.score").as("score"))
  }
}
