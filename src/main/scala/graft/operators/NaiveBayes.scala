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
    val nDocs = base.agg(count(lit(1)).as("__n"))
    val priors = base.groupBy(col("label"))
      .agg(count(lit(1)).as("__docs"))
      .crossJoin(broadcast(nDocs))
      .select(col("label"), lit(null).cast("string").as("token"),
        round(log(col("__docs") / col("__n")), 6).as("logp"),
        lit("prior").as("kind"))
    val counts = base
      .select(col("label"), explode(col("__toks")).as("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("__c"))
    // totals anchor on the PRIOR label set, not the token counts: a
    // label whose training docs are all token-free still needs its
    // default row (ln(alpha/(0 + alpha*V))) — otherwise classify's
    // label table would silently drop it and an empty test doc could
    // argmax a different label than the all-priors rule
    val totals = base.select(col("label")).distinct()
      .join(counts.groupBy(col("label")).agg(sum(col("__c")).as("__t")),
        Seq("label"), "left")
      .select(col("label"), coalesce(col("__t"), lit(0L)).as("__t"))
    val vocab = counts.select(col("token")).distinct()
      .agg(count(lit(1)).as("__v"))
    val conds = counts.join(totals, Seq("label"))
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
