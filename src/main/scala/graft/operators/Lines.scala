package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style LINE-level cleaning (the §2.2 rules of "Exploring the
  * Limits of Transfer Learning", the C4 corpus build; see also
  * CCNet's per-line filtering): where [[TextAnalysis.gopherRules]]
  * gates whole documents on line STATISTICS, this stage REWRITES each
  * document by dropping its offending lines — the navigation stubs,
  * cookie/JS warnings, and fragment lines that survive document-level
  * gates by hiding inside otherwise-good pages.
  *
  * Line rules (a line is kept iff ALL hold):
  *   - ends in terminal punctuation (`. ! ? "` — the C4 rule; a
  *     trailing close-quote after a terminator also passes),
  *   - has at least `minLineWords` whitespace words,
  *   - does not contain the word "javascript" (case-insensitive — the
  *     "please enable javascript" boilerplate class).
  *
  * Document flags (the C4 DOC-level rules, surfaced as booleans so the
  * caller composes the gate — [[graft.pipelines.TrainingData.clean]]
  * would drop flagged docs with a lineage reason):
  *   - `has_brace`: any `{` in the ORIGINAL text (code, not prose),
  *   - `has_lorem`: "lorem ipsum" (case-insensitive) anywhere.
  *
  * Scale shape: one map-only projection — split on newline, one HOF
  * filter, order-preserving rejoin; no shuffle, no state, and the
  * per-line predicates are codegen'd string primitives, so the stage
  * is scan-bandwidth-bounded like the other class-(a) cleaners.
  * Returns one row per input document: (idCol, n_lines, n_kept, text,
  * has_brace, has_lorem) with `text` the kept lines newline-joined
  * (possibly empty — surfaced, not dropped; downstream length gates
  * decide, the [[Sentences.stripRepeated]] contract).
  */
object Lines {

  /** The keep predicate for one line value. */
  def c4LineKeep(l: Column, minLineWords: Int): Column = {
    val t = trim(l)
    t.rlike("[.!?\"”]$") &&
      size(split(t, "\\s+")) >= minLineWords &&
      !lower(t).contains("javascript")
  }

  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 3): DataFrame = {
    require(minLineWords >= 1, "minLineWords must be >= 1")
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => c4LineKeep(l, minLineWords))
    docs.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("text"),
      col(textCol).contains("{").as("has_brace"),
      lower(col(textCol)).contains("lorem ipsum").as("has_lorem"))
  }
}
