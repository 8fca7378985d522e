package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus mixing: downsample each source to (approximately) a per-source
  * token budget — the step that turns a pile of crawled sources into a
  * training mix with deliberate proportions. Oversized sources are thinned
  * to `budget / total` of their rows; sources already under budget pass
  * through whole.
  *
  * Membership reuses [[Sampling.unitHash]]: a pure function of the
  * document id, so the mix is reproducible run-to-run, invariant under
  * partitioning, auditable ("why is this doc in the mix?"), and nested —
  * raising a budget keeps every previously-kept doc (the hash threshold
  * only moves up), which matters when a mix is re-cut mid-project.
  *
  * Scale shape: ONE tiny aggregate (a row per source) broadcast back onto
  * the corpus scan, then a map-only hash filter — no corpus shuffle at
  * all. The expected kept-token mass per thinned source is the budget
  * (the hash is uniform; exactness is the spec'd +-few-% of a Bernoulli
  * sample, NOT a hard cap — callers needing an exact cap pack or truncate
  * downstream).
  */
object Mixing {

  /** Keep each source's rows with probability min(1, budget/totalTokens),
    * deterministically by `idCol`. `budgets` maps source values to their
    * token budgets (in whatever unit `tokensCol` carries); absent sources
    * use `defaultBudget`. Distinct `salt`s cut independent mixes.
    */
  def mixToTokenBudget(docs: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, budgets: Map[String, Long], defaultBudget: Long,
      salt: String = ""): DataFrame = {
    require(defaultBudget >= 0, "defaultBudget must be >= 0")
    budgets.values.foreach(b => require(b >= 0, "budgets must be >= 0"))
    val totals = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("__total"))
    val budget = budgets.foldLeft(lit(defaultBudget)) {
      case (rest, (source, b)) =>
        when(col(sourceCol) === source, lit(b)).otherwise(rest)
    }.cast("long")
    docs.join(broadcast(totals), sourceCol)
      .withColumn("__frac",
        when(col("__total") <= budget, lit(1.0))
          .otherwise(budget.cast("double") / col("__total").cast("double")))
      .where(Sampling.unitHash(col(idCol), salt) < col("__frac"))
      .drop("__total", "__frac")
  }

  /** Temperature-based source mixing (the multinomial-with-exponent
    * schedule of multilingual LM training, XLM-R/mT5 style): source i
    * gets probability `n_i^alpha / sum_j n_j^alpha` of the total token
    * budget, so `alpha < 1` flattens the natural distribution — small
    * sources are UP-weighted, dominant crawls down-weighted — and
    * `alpha = 1` reduces to proportional sampling. The per-source keep
    * rate `budget_i / n_i` may exceed 1: up-weighted sources are
    * REPEATED, each kept row tagged with `mix_copy` (1-based), full
    * copies kept outright and the fractional last copy decided by the
    * same unit hash as [[mixToTokenBudget]] — membership stays a pure
    * function of (id, salt), reproducible and partitioning-invariant.
    * `maxRate` caps repetition (a tiny source under small alpha would
    * otherwise repeat unboundedly; capping at a few epochs is standard).
    *
    * Scale shape: ONE corpus scan feeding one tiny per-source aggregate;
    * the normalizer is a window sum over that per-source frame (a single
    * partition of #sources rows — fine for any realistic source count),
    * and the rate table broadcasts back. The corpus itself never
    * shuffles — the only corpus-sized work is the map-side explode of at
    * most `ceil(rate) <= maxRate` copies. Rates are rounded to 12
    * decimals so the oracle's independently-computed doubles agree
    * bit-for-bit on every membership comparison.
    */
  /** Perplexity-bucketed mixing — the DoReMi-lite / CCNet head-middle-tail
    * heuristic composed from the engine's own pieces: documents arrive
    * ALREADY SCORED with LM bits ([[NgramLm.scoreBits]] /
    * [[NgramLm.scoreBitsTrigram]], the q98/q125 quality filters), are cut
    * into `budgets.length` equal-mass perplexity buckets at exact corpus
    * quantiles (bucket 0 = lowest bits = the head real pipelines
    * up-weight), and each bucket thins to ITS OWN token budget with the
    * [[mixToTokenBudget]] math — so "keep most of the head, sample the
    * middle, trickle the tail" is three numbers.
    *
    * Scale shape: ONE tiny quantile aggregate over the scored frame
    * (cuts rounded at 9 decimals — the q108 percentile determinism pin,
    * `quantile_cont` replayable) broadcast back as the bucket
    * assignment, one per-bucket totals aggregate broadcast back as the
    * keep fraction, then the map-only unit-hash filter. The corpus never
    * shuffles; membership is a pure function of (id, salt) — nested
    * under budget raises per bucket, reproducible, auditable.
    *
    * Returns the kept rows with their `ppl_bucket` (0-based) column.
    */
  def mixByPerplexityBuckets(scored: DataFrame, idCol: String,
      bitsCol: String, tokensCol: String, budgets: Seq[Long],
      salt: String = ""): DataFrame = {
    require(budgets.length >= 2, "need at least 2 buckets")
    budgets.foreach(b => require(b >= 0, "budgets must be >= 0"))
    val n = budgets.length
    val cuts = scored.agg(
      round(call_function("percentile", col(bitsCol), lit(1.0 / n)), 9)
        .as("__c1"),
      (2 until n).map(k =>
        round(call_function("percentile", col(bitsCol), lit(k.toDouble / n)), 9)
          .as(s"__c$k")): _*)
    val bucketed = scored.crossJoin(broadcast(cuts))
      .withColumn("ppl_bucket",
        (1 until n).foldLeft(lit(0)) { (acc, k) =>
          acc + when(col(bitsCol) > col(s"__c$k"), 1).otherwise(0) })
      .drop((1 until n).map(k => s"__c$k"): _*)
    val totals = bucketed.groupBy(col("ppl_bucket"))
      .agg(sum(col(tokensCol)).cast("long").as("__total"))
    val budget = (0 until n).foldLeft(lit(0L)) { (rest, i) =>
      when(col("ppl_bucket") === i, lit(budgets(i))).otherwise(rest)
    }.cast("long")
    bucketed.join(broadcast(totals), Seq("ppl_bucket"))
      .withColumn("__frac",
        when(col("__total") <= budget, lit(1.0))
          .otherwise(budget.cast("double") / col("__total").cast("double")))
      .where(Sampling.unitHash(col(idCol), salt) < col("__frac"))
      .drop("__total", "__frac")
  }

  def mixByTemperature(docs: DataFrame, idCol: String, sourceCol: String,
      tokensCol: String, alpha: Double, totalBudget: Long,
      salt: String = "", maxRate: Double = 10.0): DataFrame = {
    require(alpha > 0, "alpha must be > 0")
    require(totalBudget >= 0, "totalBudget must be >= 0")
    require(maxRate >= 1, "maxRate must be >= 1")
    // the normalizer Z is a window sum over the TINY per-source frame
    // (empty partitionBy = one partition of #sources rows), not a second
    // aggregate over the corpus: one corpus scan, no extra join
    val everything = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = docs.groupBy(col(sourceCol))
      .agg(sum(col(tokensCol)).cast("long").as("__n"))
      .withColumn("__pw", pow(col("__n").cast("double"), lit(alpha)))
      .withColumn("__rate",
        // a zero-token-mass source has zero share BY DEFINITION — guard
        // the division (ANSI would throw; non-ANSI NULL would sneak
        // through least() as rate = maxRate, the exact opposite)
        when(col("__n") <= 0, lit(0.0))
          .otherwise(round(least(
            lit(totalBudget.toDouble) * col("__pw")
              / sum(col("__pw")).over(everything)
              / col("__n").cast("double"),
            lit(maxRate)), 12)))
      .select(col(sourceCol), col("__rate"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .where(col("__rate") > 0)
      .withColumn("mix_copy",
        explode(sequence(lit(1), ceil(col("__rate")).cast("int"))))
      .where(col("mix_copy") <= floor(col("__rate")) ||
        Sampling.unitHash(col(idCol), salt) <
          col("__rate") - floor(col("__rate")))
      .drop("__rate")
  }
}
