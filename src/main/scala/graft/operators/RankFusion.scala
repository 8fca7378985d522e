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
  /** Graded ranking quality: per-query nDCG@k of a retrieved list
    * against judged (query_id, id, grade) relevance — THE ranking
    * metric when relevance is graded (recall sees only set membership;
    * nDCG rewards putting the best-judged documents first).
    * `ranked` is the standard (query_id, rank, id) retrieval shape;
    * `judgments` holds non-negative integer grades. Output one
    * (query_id, ndcg) row per JUDGED query — a judged query the
    * retriever missed entirely scores 0, a retrieved-but-unjudged
    * query is unmeasurable and absent (the standard eval posture).
    *
    * Determinism is the integer-micros discipline: each position's
    * contribution is round(round((2^grade - 1) / (ln(rank+1)/ln 2),
    * 6) * 1e6) — an exact long — summed order-invariantly into
    * DCG/IDCG before the one final rounded division, so the DuckDB
    * oracle replays the sums exactly. IDCG ranks the query's own
    * judgments ideally (grade desc, id asc — tied grades contribute
    * identically, so the tiebreak cannot move the sum); an
    * all-grades-zero query defines ndcg = 0 rather than 0/0.
    *
    * Scale: `ranked` is queries x k rows; `judgments` is a human/LLM
    * eval artifact (queries x judged-pool, thousands not billions) —
    * the window rank over it is per-query bounded, and nothing here
    * touches corpus rows.
    */
  def ndcgAtK(ranked: DataFrame, judgments: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val j = dedupJudgments(judgments, idCol)
    // dedup the ranked side to its MIN rank per (query, doc)
    // symmetrically: a messy candidate frame repeating a doc at two
    // ranks must not double-count its DCG contribution either (the
    // rankingRecall both-sides-defensive posture)
    val dcg = dedupRanked(ranked, idCol, k)
      .join(j, Seq("query_id", idCol))
      .select(col("query_id"), dcgContrib(col("rank")).as("__c"))
      .groupBy(col("query_id")).agg(sum(col("__c")).as("__dcg"))
    idcgOf(j, idCol, k).join(dcg, Seq("query_id"), "left")
      .select(col("query_id"), ndcgRatio)
  }

  /** Defensively collapse duplicate judgments to their MAX grade: a
    * messy eval frame carrying the same (query, doc) twice with
    * conflicting grades must not double-count its DCG contribution
    * (a bare distinct would keep both rows).
    */
  private def dedupJudgments(judgments: DataFrame,
      idCol: String): DataFrame =
    judgments
      .select(col("query_id"), col(idCol),
        col("grade").cast("long").as("grade"))
      .groupBy(col("query_id"), col(idCol))
      .agg(max(col("grade")).as("grade"))

  private def dedupRanked(ranked: DataFrame, idCol: String,
      k: Int): DataFrame =
    ranked.where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"))
      .groupBy(col("query_id"), col(idCol))
      .agg(min(col("rank")).as("rank"))

  /** One position's integer-micro DCG contribution: reads `grade` from
    * scope, takes the 1-based rank column.
    */
  private def dcgContrib(rankCol: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    round(round((pow(lit(2.0), col("grade")) - 1) /
      (log(rankCol.cast("double") + 1) / log(lit(2.0))), 6) * 1e6)
      .cast("long")

  /** Per-query IDCG micros over deduped judgments (ideal order: grade
    * desc, id asc — tied grades contribute identically, so the
    * tiebreak cannot move the sum).
    */
  private def idcgOf(j: DataFrame, idCol: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("grade").desc, col(idCol))
    j.withColumn("__ir", row_number().over(w))
      .where(col("__ir") <= k)
      .select(col("query_id"), dcgContrib(col("__ir")).as("__c"))
      .groupBy(col("query_id")).agg(sum(col("__c")).as("__idcg"))
  }

  /** The final `__dcg`/`__idcg` → `ndcg` projection (0 when IDCG is 0
    * rather than 0/0; a query the run missed contributes NULL dcg → 0).
    */
  private def ndcgRatio: org.apache.spark.sql.Column =
    when(col("__idcg") === 0, lit(0.0))
      // dcg/idcg are integer micros — one fixed-point half-up division
      .otherwise(graft.functions.FixedPoint.ratio6(
        coalesce(col("__dcg"), lit(0L)), col("__idcg"))).as("ndcg")

  /** Side-by-side ranking-quality leaderboard: mean nDCG@k of several
    * NAMED retrieval runs against one shared judgment frame — "which
    * ranker should serve this corpus", the eval artifact that turns
    * the retrieval layer's many strategies (lexical, fuzzy, boolean,
    * query-by-example, dense, fused) into one comparable table.
    * Output one (ranker, mean_ndcg, n_queries) row per run;
    * `n_queries` is identical across runs by construction (every
    * judged query scores in every run — a missed query scores 0, the
    * [[ndcgAtK]] posture), so the means compare apples to apples.
    *
    * Determinism: per-query ndcg values are 6-decimal-rounded doubles
    * (exact by [[ndcgAtK]]'s integer-micros discipline); the mean
    * re-enters integer space — round(ndcg * 1e6) summed as longs,
    * ONE rounded division at the end — so the aggregate is
    * order-invariant and the DuckDB oracle replays it exactly.
    *
    * Scale: every input is a queries x k list and the judgments are
    * an eval artifact (thousands of rows) — nothing corpus-sized.
    * Unlike R independent [[ndcgAtK]] calls (which would re-derive the
    * ranker-independent IDCG R times and re-plan the judgment subtree
    * 2R times), the runs union into ONE labeled DCG aggregate sharing
    * one spilled judgment scan and one IDCG window; the per-query math
    * is the same [[dcgContrib]]/[[idcgOf]]/[[ndcgRatio]] components
    * ndcgAtK itself runs (mean-equivalence spec-pinned).
    */
  def ndcgLeaderboard(rankings: Seq[(String, DataFrame)],
      judgments: DataFrame, idCol: String, k: Int): DataFrame = {
    require(rankings.nonEmpty, "at least one ranking")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranker names must be unique")
    val j = graft.io.Spill(dedupJudgments(judgments, idCol),
      "graft-rankeval-j-")
    val labeled = rankings
      .map { case (name, ranked) =>
        dedupRanked(ranked, idCol, k)
          .select(lit(name).as("ranker"), col("query_id"), col(idCol),
            col("rank")) }
      .reduce(_ unionByName _)
    val dcg = labeled.join(j, Seq("query_id", idCol))
      .select(col("ranker"), col("query_id"),
        dcgContrib(col("rank")).as("__c"))
      .groupBy(col("ranker"), col("query_id"))
      .agg(sum(col("__c")).as("__dcg"))
    // every judged query scores in every run (a missed query scores 0
    // through the left join), so n_queries is comparable across rows
    idcgOf(j, idCol, k)
      .select(col("query_id"), col("__idcg"),
        explode(typedLit(rankings.map(_._1))).as("ranker"))
      .join(dcg, Seq("ranker", "query_id"), "left")
      .select(col("ranker"), ndcgRatio)
      .groupBy(col("ranker"))
      .agg(
        // mean of micro-quantized per-query ndcg as ONE fixed-point
        // half-up long division (micros-sum / n), then the exact /1e6 —
        // round(double, 6) on the mean was the r16 divergence class
        graft.functions.FixedPoint.fromMicros(call_function("div",
          sum(round(col("ndcg") * 1e6).cast("long")) * 2 + count(lit(1)),
          count(lit(1)) * 2)).as("mean_ndcg"),
        count(lit(1)).as("n_queries"))
  }

  /** Per-query reciprocal rank at k: 1/rank of the FIRST relevant
    * (grade > 0) document in the top-k, the navigational-quality twin
    * of [[ndcgAtK]] (one row per query; average the `rr` column for
    * the scalar MRR). Output (query_id, first_rank, rr) for every
    * query holding at least one relevant judgment; a query whose
    * relevant documents never surface in the top-k scores
    * (first_rank 0, rr 0.0). rr rounds to 6 decimals so the DuckDB
    * oracle replays it exactly.
    */
  def mrrAtK(ranked: DataFrame, judgments: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val rel = judgments.where(col("grade") > 0)
      .select(col("query_id"), col(idCol)).distinct()
    val first = ranked.where(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("rank"))
      .join(rel, Seq("query_id", idCol))
      .groupBy(col("query_id")).agg(min(col("rank")).as("__fr"))
    rel.select(col("query_id")).distinct()
      .join(first, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("__fr"), lit(0L)).cast("long").as("first_rank"),
        when(col("__fr").isNull, lit(0.0))
          // fixed-point micros, never round(double, 6): 1/rank sits
          // exactly on a 6-decimal half for ranks like 640 (2^7*5),
          // where the engines' double rounding diverges (the r16 class)
          .otherwise(graft.functions.FixedPoint.ratio6(
            lit(1L), col("__fr").cast("long")))
          .as("rr"))
  }

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
        graft.functions.FixedPoint.ratio6(col("n_hit"), col("n_ref"))
          .as("recall"))
  }
}
