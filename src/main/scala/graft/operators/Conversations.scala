package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation/transcript assembly — the instruction-tuning (SFT)
  * side of training-data prep: interaction logs arrive as EVENT rows
  * (one row per turn), training wants one ROW PER CONVERSATION — the
  * turns in order, rendered as a transcript, truncated to a token
  * budget keeping the MOST RECENT turns (the context-window
  * convention: the tail carries the state the next reply depends on;
  * dropping the head loses stale context, dropping the tail loses the
  * answer).
  *
  * Shape: one window + one aggregate over the SAME key partitioning —
  * the suffix token sums come from a `sum() OVER (key ORDER BY ts
  * DESC)` running window, the keep set is `suffix_sum <= budget`
  * (token counts are non-negative, so the suffix sums are monotone
  * from the tail and the keep set is automatically the maximal
  * contiguous recent suffix — no stop flag needed), and the per-key
  * fold groups on the window's own partitioning, so Catalyst plans ONE
  * exchange for both. Nothing driver-side; per-conversation state is
  * one turn list, bounded by the conversation, never the corpus.
  *
  * A conversation whose most recent turn alone exceeds the budget
  * keeps zero turns (empty transcript, n_kept = 0) — surfaced, not
  * dropped, so the caller can audit oversized heads.
  */
object Conversations {

  /** Whitespace token count of one turn's content. */
  private def tok(c: Column): Column =
    size(filter(split(c, "\\s+"), x => x =!= "")).cast("long")

  /** Assemble per-`keyCol` transcripts from (tsCol, seqCol)-ordered
    * turns of (roleCol, contentCol), truncated from the HEAD to
    * `tokenBudget` whitespace tokens. `seqCol` breaks timestamp ties
    * deterministically (an event id). Returns one row per key:
    * (key, n_turns, n_kept, tokens_kept, transcript) with turns
    * rendered `role: content` joined by newlines, oldest kept first.
    */
  def assemble(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, roleCol: String, contentCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(seqCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = events
      .select(col(keyCol), col(tsCol), col(seqCol),
        col(roleCol).cast("string").as("__role"),
        col(contentCol).cast("string").as("__content"),
        tok(col(contentCol)).as("__tok"))
      .withColumn("__keep", sum(col("__tok")).over(wDesc) <= tokenBudget)
    marked.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), col("__tok")).otherwise(0L))
          .as("tokens_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col(tsCol).as("t"), col(seqCol).as("s"),
              col("__role").as("r"), col("__content").as("c"))))),
          x => concat(x.getField("r"), lit(": "), x.getField("c"))),
          "\n").as("transcript"))
  }

  /** SFT loss-mask spans for [[assemble]]'s transcripts: one row per
    * KEPT turn with its whitespace-token offsets in the assembled
    * transcript and whether the loss trains on it — the standard
    * instruction-tuning convention (train on assistant turns only; the
    * prompt/user/tool tokens are context, and training on them teaches
    * the model to parrot users). Keeping mask construction beside
    * assembly — same budget walk, same rendering — is what makes the
    * offsets TRUSTWORTHY: a separately-computed mask drifts the moment
    * the renderer changes.
    *
    * Output: `(key, turn_no, role, token_start, token_end, train)` —
    * `turn_no` 0-based among kept turns oldest-first, offsets
    * half-open `[token_start, token_end)` over the transcript's
    * whitespace tokens (each turn's width is the token count of its
    * full `role: content` rendering, so any role string is accounted
    * exactly), `train` = membership of `trainRoles`. Turns a
    * [[Chunking]]/packer downstream can convert to per-token 0/1
    * weights with one `sequence()` explode.
    *
    * Same scale shape as [[assemble]]: the descending budget window and
    * the ascending offset window share one key partitioning — Catalyst
    * plans ONE exchange for both.
    */
  def lossMaskSpans(events: DataFrame, keyCol: String, tsCol: String,
      seqCol: String, roleCol: String, contentCol: String,
      tokenBudget: Long, trainRoles: Seq[String]): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(trainRoles.nonEmpty, "trainRoles must name at least one role")
    val wDesc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(seqCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(seqCol))
    val kept = events
      .select(col(keyCol), col(tsCol), col(seqCol),
        col(roleCol).cast("string").as("role"),
        tok(concat(col(roleCol).cast("string"), lit(": "),
          col(contentCol).cast("string"))).as("__w"),
        tok(col(contentCol)).as("__tok"))
      .withColumn("__keep", sum(col("__tok")).over(wDesc) <= tokenBudget)
      .where(col("__keep"))
    kept
      .withColumn("turn_no", (row_number().over(wAsc) - 1).cast("long"))
      .withColumn("token_end", sum(col("__w")).over(wAsc))
      .select(col(keyCol), col("turn_no"), col("role"),
        (col("token_end") - col("__w")).as("token_start"),
        col("token_end"),
        col("role").isInCollection(trainRoles).as("train"))
  }
}
