package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** WordPiece tokenization (the BERT posture) — the third production
  * tokenizer family, completing the triad with BPE
  * ([[graft.functions.Bpe]] / [[BpeTraining]], greedy merge replay) and
  * unigram-LM ([[UnigramLm]], Viterbi DP): segmentation is GREEDY
  * LONGEST-MATCH-FIRST against a vocabulary whose word-interior pieces
  * carry a `##` continuation prefix, and a word with NO match at some
  * position collapses whole to `[UNK]` (all-or-nothing, unlike
  * unigram's per-character fallback).
  *
  * Split of labor mirrors the other two families exactly: segmentation
  * is the map-only imperative expression
  * [[graft.functions.WordPieceSegment]] with the vocabulary embedded —
  * pure string matching, no scores — so the DuckDB oracle replays it
  * verbatim with a recursive CTE over distinct words (longest match =
  * `list_max` over matching candidate lengths). [[DefaultVocab]] is a
  * hand-built table standing in for a trained one (the
  * [[graft.functions.Bpe.Merges]] precedent — the ALGORITHM is the
  * deliverable, the table a pluggable constant), ambiguous on purpose:
  * `table` beats `tab`+`##le`, digits exist only word-initially so a
  * word with an interior digit exercises the `[UNK]` collapse.
  */
object WordPiece {

  val ContPrefix: String = "##"
  val UnkToken: String = "[UNK]"
  val DefaultMaxPieceLen: Int = 8

  /** Letters a-z in both word-initial and continuation form (full
    * alphabetic coverage); digits ONLY word-initial — a word with an
    * interior digit has no match there and collapses to `[UNK]`,
    * exercising the all-or-nothing rule on real fixture words. Multi-
    * char pieces overlap the unigram vocabulary's ambiguity set so the
    * longest-match rule is actually load-bearing.
    */
  val DefaultVocab: Seq[String] = {
    val initials = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val conts = ('a' to 'z').map(c => ContPrefix + c)
    val pieces = Seq(
      "the", "table", "tab", "data", "row", "key", "scan", "join",
      "hash", "sort", "query", "value", "val", "group", "gr", "merge",
      "part", "batch", "fast", "slow", "small", "big", "agg", "dup",
      "filter", "line", "order", "col", "spark", "cust", "wind", "vec",
      "str", "in", "re", "an", "or", "st")
    val contPieces = Seq(
      "##le", "##ble", "##ue", "##oup", "##er", "##st", "##an", "##or",
      "##in", "##re", "##ing", "##ed", "##es", "##umn", "##om", "##ow",
      "##tor", "##eam", "##ata", "##ery")
    initials ++ conts ++ pieces ++ contPieces
  }

  /** Greedy segmentation of `words` (an array column): a struct of
    * (pieces ARRAY<STRING> in order, n_unk_words LONG).
    */
  def segmentWords(words: Column, vocab: Seq[String] = DefaultVocab,
      contPrefix: String = ContPrefix, unkToken: String = UnkToken,
      maxPieceLen: Int = DefaultMaxPieceLen): Column =
    call_function("wordpiece_segment", words, lit(vocab.toArray),
      lit(contPrefix), lit(unkToken), lit(maxPieceLen))

  /** Per-document segmentation accounting over `textCol` (tokenized by
    * [[TextFunctions.words]]): word count, piece count, UNK-collapsed
    * word count, and the space-joined segmentation (md5-able).
    * Map-only — one expression eval per document.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      vocab: Seq[String] = DefaultVocab,
      contPrefix: String = ContPrefix, unkToken: String = UnkToken,
      maxPieceLen: Int = DefaultMaxPieceLen): DataFrame =
    docs
      .select(col(idCol), TextFunctions.words(col(textCol)).as("__w"))
      .select(col(idCol), col("__w"),
        segmentWords(col("__w"), vocab, contPrefix, unkToken, maxPieceLen)
          .as("__s"))
      .select(col(idCol),
        size(col("__w")).cast("long").as("n_words"),
        size(col("__s.pieces")).cast("long").as("n_pieces"),
        col("__s.n_unk_words").as("n_unk_words"),
        array_join(col("__s.pieces"), " ").as("segmentation"))
}
