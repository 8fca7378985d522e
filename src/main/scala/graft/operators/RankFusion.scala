package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval: combine the ranked lists of several
  * retrievers (lexical [[TextAnalysis.bm25TopK]], dense
  * [[Similarity.batchExactTopK]]/batchLshTopK, or any frame shaped
  * (query_id, rank, id)) into one consensus ranking per query.
  *
  * Reciprocal-rank fusion (Cormack et al., SIGIR 2009) is the standard
  * because it needs NO score calibration across retrievers — BM25 sums
  * and cosines are incomparable, ranks always compare — and a document
  * ranked well by several lists beats one ranked first by a single list.
  */
object RankFusion {

  /** Fuse `rankings` by RRF: fused(d) = Σ_r 1/(k0 + rank_r(d)), top `k`
    * per query, ties to the ascending id (the q95 contract). Each input
    * contributes at most its own list length per query, so the fusion
    * input is rankers x queries x k rows by construction — the plan is
    * one union + one (query, id) sum aggregate + the bounded
    * [[graft.functions.TopKAggregator]] tail, trivially small next to
    * the retrievers that produced the lists.
    *
    * Determinism is the integer-micros discipline: each contribution is
    * round(1e9 / (k0 + rank)) — an exact integer from exact integer
    * inputs, identical in any engine — and the per-(query, id) total is
    * an order-invariant integer sum, so fused ranks replay exactly in
    * the DuckDB oracle (double-summed reciprocals would be
    * partitioning-dependent in the last ulp).
    */
  def rrf(rankings: Seq[DataFrame], idCol: String, k: Int,
      k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    require(k > 0, "k must be positive")
    require(k0 >= 0, "k0 must be >= 0")
    val contrib = rankings
      .map(_.select(col("query_id"), col(idCol),
        round(lit(1e9) / (lit(k0) + col("rank"))).cast("long").as("__s")))
      .reduce(_ unionByName _)
    Similarity.rankTopKPerQuery(
      contrib.groupBy(col("query_id"), col(idCol))
        .agg(sum(col("__s")).as("__m"))
        .select(col("query_id"), col(idCol),
          col("__m").cast("double").as("sim")),
      idCol, k)
  }

  /** Per-query recall of a candidate ranking against a reference
    * ranking: |candidate ∩ reference| / |reference| — the direct
    * quality metric of an approximate index
    * ([[Similarity.batchLshTopK]] vs [[Similarity.batchExactTopK]]),
    * and the measurement the drift-triggered refit loop
    * ([[Similarity.maintainIvfIndex]]) exists to protect. "Measure,
    * don't guess": a recall sweep on a probe sample belongs in the
    * same maintenance cadence as the drift check.
    *
    * Queries present in `reference` but absent from `candidate` report
    * recall 0; queries only in `candidate` are ignored (no reference to
    * recall against). Inputs are top-k lists, so this is queries x k
    * rows end to end — one left join + one count aggregate. Recall
    * rounds to 6 decimals (an exact small-integer ratio; rounding only
    * pins the cross-engine repr).
    */
  def rankingRecall(candidate: DataFrame, reference: DataFrame,
      idCol: String): DataFrame = {
    // BOTH sides dedup defensively: a raw multi-table match list passed
    // as either argument (the mistake the distinct anticipates) must not
    // inflate n_ref or double-count hits
    val cand = candidate.select(col("query_id"), col(idCol)).distinct()
      .withColumn("__hit", lit(1L))
    reference.select(col("query_id"), col(idCol)).distinct()
      .join(cand, Seq("query_id", idCol), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_ref"),
        coalesce(sum(col("__hit")), lit(0L)).as("n_hit"))
      .select(col("query_id"), col("n_ref"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_ref").cast("double"), 6)
          .as("recall"))
  }
}
