package graft.operators

import org.apache.spark.sql.DataFrame
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
}
