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
}
