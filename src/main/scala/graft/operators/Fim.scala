package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Fill-in-the-middle (FIM) training transforms: rewrite a fraction of
  * documents as (prefix, suffix, middle) infilling examples so a
  * left-to-right LM learns to complete holes — the standard code-model
  * data augmentation ("Efficient Training of Language Models to Fill in
  * the Middle", the PSM/SPM formats). Reference scope: the scaffold has
  * no training-data surface; this extends the LLM-pipeline family per
  * the project north star.
  *
  * Everything is DETERMINISTIC per (id, salt) through
  * [[Sampling.unitHash]] — which documents transform, where the two cuts
  * fall, and which format (PSM or SPM) each transformed doc gets are all
  * pure hash functions, so re-runs, repartitionings, and external
  * engines reproduce the exact same training set (the auditability
  * contract every op in [[Sampling]] carries), and distinct salts give
  * independent draws per epoch.
  *
  * Cuts are TOKEN-level (the whitespace tokenization shared with
  * [[Chunking]]): cut1 = floor(u1 * (n+1)), cut2 = cut1 +
  * floor(u2 * (n - cut1 + 1)), so 0 <= cut1 <= cut2 <= n uniformly over
  * valid cut pairs — empty prefix/middle/suffix segments are legal (the
  * paper's posture: degenerate holes teach open-ended completion).
  * Output text is sentinel-joined:
  * PSM `<PRE> prefix <SUF> suffix <MID> middle`, SPM
  * `<SUF> suffix <PRE> prefix <MID> middle` (middle always LAST — the
  * model generates it); untransformed docs pass through verbatim with
  * fmt 'plain'. The caller maps sentinels to real tokenizer specials.
  *
  * SENTINEL COLLISION: the sentinels are plain strings spliced into the
  * whitespace-joined output — a document whose own tokens contain
  * `<PRE>`/`<SUF>`/`<MID>` (or `<extra_id_k>` for [[spanCorrupt]])
  * produces AMBIGUOUS, unreconstructable output. Both transforms
  * therefore emit a `sentinel_clash` flag so callers can route such docs
  * out (or re-salt them into the plain lane) BEFORE sentinel mapping:
  * [[transform]] flags an exact whitespace-token match against the three
  * sentinels; [[spanCorrupt]] flags conservatively on the `<extra_id_`
  * substring anywhere in the text (a superset — the cheap codegen'd
  * check; routing a rare false positive out costs one document,
  * missing a true positive corrupts a training example).
  *
  * Scale posture: one map-only codegen'd projection — no shuffle, no
  * state, no driver loop; at 100 TB this runs at scan speed alongside
  * the other map-only cleaners.
  */
object Fim {

  val PRE = "<PRE>"
  val SUF = "<SUF>"
  val MID = "<MID>"

  /** Transform ~`fimFraction` of docs into infilling examples, of which
    * ~`spmFraction` use SPM ordering (the rest PSM). Output: idCol,
    * `fmt` ('plain'|'psm'|'spm'), `n_tokens` (long, of the ORIGINAL
    * text), `sentinel_clash` (true iff a source token IS one of the
    * sentinels — the output is then ambiguous; route such docs out),
    * `text_out`.
    */
  def transform(df: DataFrame, idCol: String, textCol: String,
      fimFraction: Double, spmFraction: Double = 0.5,
      salt: String = ""): DataFrame = {
    require(fimFraction >= 0 && fimFraction <= 1,
      "fimFraction must be in [0,1]")
    require(spmFraction >= 0 && spmFraction <= 1,
      "spmFraction must be in [0,1]")
    val id = col(idCol)
    def u(tag: String) = Sampling.unitHash(id, salt + tag)
    val toks = wsTokens(col(textCol))
    val n = size(toks)
    // floor(u*(n+1)) lands uniformly in [0, n]; the second draw spans
    // the remaining tail so (cut1, cut2) covers every valid pair
    val cut1 = floor(u("c1") * (n + 1)).cast("int")
    val cut2 = (cut1 + floor(u("c2") * (n - cut1 + 1)).cast("int"))
    // token-array assembly (not concat_ws over strings: empty segments
    // would leave double-space artifacts and break the exact
    // token-stream reconstruction the spec pins)
    val prefix = slice(toks, lit(1), cut1)
    val middle = slice(toks, cut1 + 1, cut2 - cut1)
    val suffix = slice(toks, cut2 + 1, greatest(n - cut2, lit(0)))
    val psm = array_join(concat(array(lit(PRE)), prefix,
      array(lit(SUF)), suffix, array(lit(MID)), middle), " ")
    val spm = array_join(concat(array(lit(SUF)), suffix,
      array(lit(PRE)), prefix, array(lit(MID)), middle), " ")
    val fmt = when(u("fim") >= fimFraction, "plain")
      .when(u("spm") < spmFraction, "spm").otherwise("psm")
    df.select(id, fmt.as("fmt"), n.cast("long").as("n_tokens"),
      arrays_overlap(toks, array(lit(PRE), lit(SUF), lit(MID)))
        .as("sentinel_clash"),
      when(fmt === "plain", col(textCol))
        .when(fmt === "spm", spm).otherwise(psm).as("text_out"))
  }

  /** T5/UL2-style span corruption — the denoising-objective transform
    * beside [[transform]]'s infilling: deterministic pseudo-random token
    * spans (expected ~`rate` of each doc's tokens, spans of `spanLen`,
    * overlaps merged) become numbered `<extra_id_k>` sentinels in
    * `input`, with the removed tokens emitted after their sentinels in
    * `target` (trailing close sentinel — the T5 convention). The draw
    * is a pure function of (id, salt, position) via
    * [[graft.functions.SpanCorrupt]], so re-runs and repartitionings
    * reproduce it exactly and distinct salts redraw per epoch. Output:
    * idCol, `n_tokens` (original), `n_spans`, `sentinel_clash` (true iff
    * the text contains the `<extra_id_` sentinel prefix — conservative
    * substring check; see the object doc's collision note), `input`,
    * `target` — one map-only projection, scan speed at any corpus size.
    */
  def spanCorrupt(df: DataFrame, idCol: String, textCol: String,
      rate: Double, spanLen: Int = 3, salt: String = ""): DataFrame = {
    val toks = wsTokens(col(textCol))
    df.select(col(idCol),
        graft.functions.GraftFunctions.span_corrupt(toks, col(idCol),
          salt, rate, spanLen).as("__c"),
        size(toks).cast("long").as("n_tokens"),
        (instr(col(textCol), "<extra_id_") > 0).as("sentinel_clash"))
      .select(col(idCol), col("n_tokens"),
        col("__c.n_spans").cast("long").as("n_spans"),
        col("sentinel_clash"),
        col("__c.input").as("input"),
        col("__c.target").as("target"))
  }
}
