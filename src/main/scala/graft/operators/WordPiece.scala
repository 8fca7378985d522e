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

  /** Train a WordPiece vocabulary from word counts (driver-side over the
    * bounded histogram, the [[BpeTraining]] posture — the one corpus-
    * proportional step is [[BpeTraining.wordHistogram]]'s hash
    * aggregate). BERT's criterion: unlike BPE's raw pair FREQUENCY, each
    * candidate merge (a,b) scores the LIKELIHOOD ratio
    * `count(ab) / (count(a)·count(b))` — preferring pairs whose parts
    * rarely occur apart over pairs of independently-common parts — with
    * deterministic ties (score desc, then left/right piece asc).
    * Interior tokens carry the `##` prefix; merging strips the right
    * part's prefix (`t`+`##a`→`ta`, `##a`+`##b`→`##ab`). Returns the
    * full vocabulary: every seen initial/continuation single character
    * (coverage — a trained-on word never hits `[UNK]`) plus the merged
    * pieces in training order.
    */
  def trainFromCounts(wordCounts: Iterable[(String, Long)], nMerges: Int,
      minCount: Long = 2L, contPrefix: String = ContPrefix,
      maxPieceLen: Int = DefaultMaxPieceLen): Seq[String] = {
    require(nMerges >= 0, "nMerges must be >= 0")
    require(minCount >= 1, "minCount must be >= 1")
    def body(t: String) =
      if (t.startsWith(contPrefix)) t.drop(contPrefix.length) else t
    var words: Array[(Array[String], Long)] = wordCounts.iterator
      .filter(_._1.nonEmpty).map { case (w, c) =>
        (w.iterator.zipWithIndex.map { case (ch, i) =>
          if (i == 0) ch.toString else contPrefix + ch
        }.toArray, c)
      }.toArray
    val singles = words.iterator.flatMap(_._1).toSeq.distinct.sorted
    val learned = Vector.newBuilder[String]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val tok = scala.collection.mutable.HashMap.empty[String, Long]
      val pair = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (toks, c) =>
        var i = 0
        while (i < toks.length) {
          tok.update(toks(i), tok.getOrElse(toks(i), 0L) + c)
          if (i < toks.length - 1) {
            val p = (toks(i), toks(i + 1))
            pair.update(p, pair.getOrElse(p, 0L) + c)
          }
          i += 1
        }
      }
      // candidates: count floor + the merged piece must stay within
      // maxPieceLen body chars (the segmenter's own contract)
      val cand = pair.iterator.filter { case ((l, r), c) =>
        c >= minCount && body(l).length + body(r).length <= maxPieceLen
      }.toSeq
      if (cand.isEmpty) done = true
      else {
        // exact rational compare: s1 > s2 <=> c1·ta2·tb2 > c2·ta1·tb1
        // (token counts are positive longs; BigInt avoids overflow)
        def key(e: ((String, String), Long)) = {
          val ((l, r), c) = e
          (BigInt(c), BigInt(tok(l)) * BigInt(tok(r)))
        }
        val best = cand.reduceLeft { (x, y) =>
          val (cx, dx) = key(x); val (cy, dy) = key(y)
          val cmp = (cx * dy).compare(cy * dx) // score cross-compare
          if (cmp > 0) x else if (cmp < 0) y
          else if (Ordering[(String, String)].lteq(x._1, y._1)) x else y
        }
        val (l, r) = best._1
        val merged = l + body(r)
        learned += merged
        words = words.map { case (toks, c) =>
          val out = new scala.collection.mutable.ArrayBuffer[String](
            toks.length)
          var j = 0
          while (j < toks.length) {
            if (j < toks.length - 1 && toks(j) == l && toks(j + 1) == r) {
              out += merged; j += 2
            } else { out += toks(j); j += 1 }
          }
          (out.toArray, c)
        }
        k += 1
      }
    }
    // distinct: two different merge steps can land on the same surface
    // string (("a","##bc") and ("ab","##c") both yield "abc"), and the
    // segmenter requires unique pieces
    (singles ++ learned.result()).distinct
  }

  /** The trainer's corpus-proportional step: one hash aggregate over
    * [[TextFunctions.words]] tokens — the SAME tokenization [[segment]]
    * applies, so a trained vocabulary's character coverage holds on the
    * corpus it was trained on ([[BpeTraining.wordHistogram]] keeps
    * case/punctuation for the BPE pre-token pattern instead). Bounded
    * to the `maxDistinctWords` most frequent words, ties lexicographic.
    */
  def wordHistogram(docs: DataFrame, textCol: String,
      maxDistinctWords: Int = 1 << 20): DataFrame = {
    require(maxDistinctWords > 0, "maxDistinctWords must be positive")
    docs
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(maxDistinctWords)
  }

  /** Train a WordPiece vocabulary from the corpus: one histogram
    * aggregate, then the driver-side merge loop bounded by DISTINCT
    * words — corpus-size-independent past the scan, the
    * [[BpeTraining.train]] contract.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L, maxDistinctWords: Int = 1 << 20,
      contPrefix: String = ContPrefix,
      maxPieceLen: Int = DefaultMaxPieceLen): Seq[String] = {
    val hist = wordHistogram(docs, textCol, maxDistinctWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(hist, nMerges, minCount, contPrefix, maxPieceLen)
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
