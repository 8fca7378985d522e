package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sentence segmentation — the granularity bridge of the pipeline:
  * bitext mining ([[Similarity.marginMinePairs]]) aligns SENTENCES,
  * span dedup and contamination checks sharpen at sentence scope, and
  * SFT data wants sentence-bounded truncation. Documents explode to
  * (doc_id, sent_id, sentence) rows in ONE map-only projection — at
  * 100 TB this is a scan-speed generate with zero shuffles, exactly
  * the [[Html]] posture one stage downstream.
  *
  * The splitter is the classic rule cascade, kept in the Java/RE2
  * common regex subset (no lookaround — RE2 has none) so the DuckDB
  * oracle replays it verbatim:
  *
  *   1. PROTECT known abbreviations: `(Dr|Mr|...)\.` → the `<<A>>`
  *      sentinel (title abbreviations must not end a sentence);
  *   2. MARK boundaries: a terminator RUN (`[.!?]+` — `...`/`?!` is
  *      ONE boundary) followed by whitespace becomes the run, the
  *      `<<S>>` sentinel, and NO space — the terminator stays WITH its
  *      sentence (the downstream tokenizer sees real sentence ends);
  *   3. SPLIT on the sentinel, RESTORE the protected dots, trim.
  *
  * The sentinels are printable ASCII tags asserted absent from the
  * input (`<<` never occurs in natural text after HTML extraction —
  * [[Html.stripTags]] has already removed markup), which keeps every
  * pattern a plain literal in both engines. A document with no
  * terminator is one sentence; leading/trailing whitespace never
  * creates empty sentences.
  */
object Sentences {

  /** Title/reference abbreviations whose trailing dot is not a
    * sentence boundary. Deliberately small and fixed: a production
    * list is a config table, the ALGORITHM is the deliverable (the
    * [[graft.functions.Bpe.Merges]] posture).
    */
  val Abbrevs: Seq[String] = Seq(
    "Dr", "Mr", "Mrs", "Ms", "Prof", "St", "No", "Fig", "vs", "etc")

  private val protectPat = s"\\b(${Abbrevs.mkString("|")})\\."
  private val boundaryPat = "([.!?]+)\\s+"

  /** The sentence LIST for one text column (used by [[split]] and
    * directly wherever an array is handier than exploded rows).
    */
  def sentenceArray(text: Column): Column = {
    val protd = regexp_replace(text, protectPat, "$1<<A>>")
    val marked = regexp_replace(protd, boundaryPat, "$1<<S>>")
    filter(
      transform(org.apache.spark.sql.functions.split(marked, "<<S>>"),
        s => trim(regexp_replace(s, "<<A>>", "."))),
      s => s =!= "")
  }

  /** Explode `textCol` into (idCol, sent_id, sentence, n_chars) rows,
    * sent_id 1-based in document order.
    */
  def split(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(sentenceArray(col(textCol)))
        .as(Seq("__p", "sentence")))
      .select(col(idCol), (col("__p") + 1).cast("long").as("sent_id"),
        col("sentence"), length(col("sentence")).cast("long").as("n_chars"))

  /** Repeated-sentence stripping — the CCNet paragraph-dedup stage at
    * sentence granularity: a sentence occurring in ≥ `minDf` DISTINCT
    * documents is boilerplate ("Subscribe to our newsletter.") and is
    * removed from EVERY document, the complement of keep-one document
    * dedup and the sentence-level sibling of [[Dedup.duplicateSpans]]
    * (which catches sub-sentence repeats).
    *
    * Scale shape (the [[Dedup]] exchange discipline): the df rollup
    * and the strip join move (doc_id, 16-byte md5) rows, never
    * sentence text; the rebuild groups on doc_id with
    * order-deterministic concat. Returns one row per input document:
    * (idCol, n_sents, n_kept, text) with `text` the kept sentences
    * joined by one space — possibly empty when everything was
    * boilerplate (surfaced, not dropped; the caller's empty-doc gate
    * decides).
    */
  def stripRepeated(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int): DataFrame = {
    require(minDf >= 2, "minDf < 2 would strip every sentence")
    val sents = graft.io.Spill(
      split(docs, idCol, textCol)
        .select(col(idCol), col("sent_id"), col("sentence"),
          md5(col("sentence")).as("__h")), "graft-sentstrip-")
    val repeated = sents.select(col(idCol), col("__h")).distinct()
      .groupBy(col("__h")).agg(count(lit(1)).as("__df"))
      .where(col("__df") >= minDf)
      .select(col("__h"))
    val kept = sents
      .join(repeated, Seq("__h"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("sent_id"), col("sentence")))),
          x => x.getField("sentence")), " ").as("text"))
    // anchor on the ORIGINAL docs frame, not the sentence rollup: a
    // document whose text yields zero sentences (empty/whitespace-only)
    // has no `sents` rows at all and must still surface as
    // (n_sents=0, n_kept=0, text='') per the one-row-per-input contract
    docs.select(col(idCol))
      .join(sents.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_sents")), Seq(idCol), "left")
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
