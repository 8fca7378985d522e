package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.words

/** N-gram language-model perplexity scoring — the classic corpus quality
  * filter (CCNet/Gopher style): documents whose text is "surprising" under
  * a bigram model of the corpus score high and get reviewed or dropped;
  * machine-generated spam, lorem-ipsum padding, and encoding garbage all
  * surface this way when rule-based scores ([[TextAnalysis.quality]]) miss
  * them.
  *
  * Model: add-one-smoothed bigram LM trained on the corpus itself,
  * p(w2|w1) = (c(w1,w2)+1) / (c(w1·)+V), scored as mean bits per bigram
  * (-log2 p averaged over the document's bigrams). Self-training makes the
  * operator a one-call outlier filter; to score against a REFERENCE corpus
  * (CCNet's Wikipedia-trained setup), train and score are split below.
  *
  * Shape at 100 TB: the model is two hash aggregates (bigram counts; the
  * context counts roll up from the bigram table, NOT from a second corpus
  * pass), the vocab size is one count-distinct, and scoring is one
  * shuffle join of the corpus bigrams against the count table plus a
  * broadcast-sized context join — no driver actions, no all-pairs, and
  * the exchanges carry (word-pair, count) rows, not documents. Tokens
  * shared with [[TextAnalysis]] ([[words]]), so the DuckDB oracle replays
  * tokenization exactly.
  */
object NgramLm {

  /** Bigram counts of `textCol` across the corpus: (w1, w2, cb). */
  def train(docs: DataFrame, textCol: String): DataFrame =
    bigrams(docs, textCol).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cb"))

  /** Mean bits-per-bigram of each document under an add-one bigram model
    * `model` ([[train]] output) with vocabulary size `vocab` (distinct
    * token count of the TRAINING corpus). Bigrams and contexts ABSENT
    * from the model fall back to the add-one floor (left joins,
    * count 0): p = 1/(c(w1·)+V) — dropping them instead (an inner join)
    * would score off-reference text as LOW surprise, inverting the
    * filter. Documents with fewer than two tokens have no bigrams and
    * are absent from the result.
    */
  def scoreBits(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, vocab: DataFrame): DataFrame = {
    // context counts c(w1·) roll up from the (already tiny) model table
    val cu = model.groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    bigrams(docs.select(col(idCol).as("doc_id"), col(textCol)), textCol,
        keep = Seq("doc_id"))
      .join(model, Seq("w1", "w2"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(vocab) // one row; broadcast by size
      .select(col("doc_id"),
        (-log2((coalesce(col("cb"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + col("v")))).as("bits"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("bits")), 4).as("bits"))
  }

  /** Self-scoring convenience: train on `docs`, score `docs`. */
  def selfScoreBits(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreBits(docs, idCol, textCol, train(docs, textCol),
      vocabSize(docs, textCol))

  /** Distinct-token count of the corpus — the V of add-one smoothing. */
  def vocabSize(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(words(col(textCol))).as("w"))
      .agg(count_distinct(col("w")).as("v"))

  /** One row per in-document bigram: `keep` columns + (w1, w2). */
  private def bigrams(docs: DataFrame, textCol: String,
      keep: Seq[String] = Nil): DataFrame = {
    val toks = docs.withColumn("__ws", words(col(textCol)))
      .where(size(col("__ws")) >= 2)
    toks.select(keep.map(col) :+
        explode(transform(sequence(lit(1), size(col("__ws")) - 1), i =>
          struct(element_at(col("__ws"), i).as("w1"),
            element_at(col("__ws"), i + 1).as("w2")))).as("__b"): _*)
      .select(keep.map(col) :+ col("__b.w1") :+ col("__b.w2"): _*)
  }
}
