package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair construction — the RLHF/DPO side of training-data
  * prep: reward-scored candidate responses per prompt become
  * (chosen, rejected) training pairs. A pair qualifies when the score
  * gap clears `minGap`, in the score's own integer scale (near-ties
  * teach nothing and amplify reward noise — the standard margin
  * filter), and each prompt
  * contributes at most `maxPairs` pairs, largest gaps first
  * (deterministic tiebreak: gap DESC, chosen ASC, rejected ASC), so
  * no prompt dominates the pair distribution.
  *
  * Scores are INTEGER-scaled (the engine-wide exact-scoring contract:
  * 1e4-scaled cosines, 1e6-scaled BM25/log scores) — every gap is
  * exact long arithmetic and the oracle replays the selection bit for
  * bit.
  *
  * Scale shape: the input is a per-prompt CANDIDATE frame — a top-k
  * output, prompts x k rows, never the corpus — so the within-prompt
  * self-join is k² per prompt and bounded; the frame spills once for
  * its two join sides (the q159 multi-consumer discipline) and the
  * per-prompt cap window partitions on the prompt key.
  */
object Preferences {

  /** Build pairs from `scored` (queryCol, candCol, scoreCol-micros):
    * (query_id, pair_no, chosen_id, rejected_id, gap),
    * pair_no 1-based per query in selection order.
    */
  def preferencePairs(scored: DataFrame, queryCol: String,
      candCol: String, scoreCol: String, minGap: Long,
      maxPairs: Int): DataFrame = {
    require(maxPairs > 0, "maxPairs must be positive")
    require(minGap > 0, "minGap must be positive — a zero " +
      "gap would pair ties in both directions")
    val base = graft.io.Spill(
      scored.select(col(queryCol).cast("long").as("query_id"),
        col(candCol).cast("long").as("__c"),
        col(scoreCol).cast("long").as("__s")), "graft-pref-")
    val pairs = base
      .join(base.select(col("query_id"), col("__c").as("__r"),
        col("__s").as("__rs")), Seq("query_id"))
      .where(col("__c") =!= col("__r") &&
        col("__s") - col("__rs") >= minGap)
      .select(col("query_id"), col("__c").as("chosen_id"),
        col("__r").as("rejected_id"),
        (col("__s") - col("__rs")).as("gap"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("gap").desc, col("chosen_id"),
        col("rejected_id"))
    pairs.withColumn("pair_no", row_number().over(w).cast("long"))
      .where(col("pair_no") <= maxPairs)
      .select(col("query_id"), col("pair_no"), col("chosen_id"),
        col("rejected_id"), col("gap"))
  }

  /** Rejection-sampling selection (best-of-N / RAFT): keep each prompt's
    * single highest-scored candidate, dropping prompts whose best falls
    * below `minScore` — the SFT-side sibling of [[preferencePairs]]
    * (there the gap makes a pair; here only the winner survives, and a
    * prompt where even the winner is weak contributes nothing rather
    * than a bad example). Ties break to the SMALLEST candidate id
    * (deterministic, engine-independent). Scores carry the same
    * integer-scale contract as [[preferencePairs]].
    *
    * Output: (query_id, best_id, best_score, n_cands).
    *
    * Scale shape: ONE hash aggregate over the candidate frame —
    * `max(struct(score, -cand))` gives argmax-with-tiebreak without a
    * window or self-join, partial aggregation map-side, so the shuffle
    * carries one row per prompt per map task.
    */
  /** The DPO-export pair: each prompt's single (chosen, rejected) =
    * (argmax, argmin) of the reward — the standard one-pair-per-prompt
    * preference artifact, beside [[preferencePairs]]'s all-qualifying-
    * pairs surface. Prompts whose best-worst gap falls under `minGap`
    * contribute nothing (near-ties teach nothing; `minGap` > 0 also
    * guarantees chosen != rejected, so single-candidate prompts drop
    * out). Ties break to the SMALLEST candidate id on both sides
    * ([[bestOfN]]'s deterministic convention). Scores carry the same
    * integer-scale contract as [[preferencePairs]].
    *
    * Output: (query_id, chosen_id, rejected_id, gap, n_cands).
    *
    * Scale shape: ONE hash aggregate — argmax and argmin ride the same
    * `max/min(struct(score, ∓cand))` trick as [[bestOfN]], partial
    * aggregation map-side, no self-join and no window, so this stays
    * one exchange where [[preferencePairs]]'s k² enumeration pays a
    * join — the right default when a run wants exactly one pair per
    * prompt.
    */
  def bestWorstPairs(scored: DataFrame, queryCol: String,
      candCol: String, scoreCol: String, minGap: Long): DataFrame = {
    require(minGap > 0, "minGap must be positive — a zero gap would " +
      "pair a candidate with itself on single-candidate prompts")
    scored.select(col(queryCol).cast("long").as("query_id"),
        col(candCol).cast("long").as("__c"),
        col(scoreCol).cast("long").as("__s"))
      .groupBy(col("query_id"))
      .agg(
        max(struct(col("__s").as("s"), (-col("__c")).as("nc"))).as("b"),
        min(struct(col("__s").as("s"), col("__c").as("c"))).as("w"),
        count(lit(1)).as("n_cands"))
      .where(col("b.s") - col("w.s") >= minGap)
      .select(col("query_id"), (-col("b.nc")).as("chosen_id"),
        col("w.c").as("rejected_id"),
        (col("b.s") - col("w.s")).as("gap"), col("n_cands"))
  }

  def bestOfN(scored: DataFrame, queryCol: String, candCol: String,
      scoreCol: String, minScore: Long = Long.MinValue): DataFrame =
    scored.select(col(queryCol).cast("long").as("query_id"),
        col(candCol).cast("long").as("__c"),
        col(scoreCol).cast("long").as("__s"))
      .groupBy(col("query_id"))
      .agg(max(struct(col("__s").as("s"), (-col("__c")).as("nc"))).as("b"),
        count(lit(1)).as("n_cands"))
      .where(col("b.s") >= minScore)
      .select(col("query_id"), (-col("b.nc")).as("best_id"),
        col("b.s").as("best_score"), col("n_cands"))
}
