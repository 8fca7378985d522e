package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — the audit stage for every model gate the
  * pipeline ships ([[NaiveBayes]] language/quality filters, [[Dsir]]
  * target-likeness, quantile floors): before a classifier is allowed
  * to drop terabytes, measure it against a labeled holdout, with the
  * same "measure, don't guess" cadence as the ANN recall audit (q138)
  * and the mining audit (q166).
  *
  * Everything is exact and oracle-replayable: counts are integers,
  * every ratio is ONE correctly-rounded integer→double division
  * (F1 via its count identity `2tp / (2tp+fp+fn)` — never the
  * p/r composition, whose intermediate rounding diverges across
  * engines), and the exact AUC uses tie-corrected integer rank sums
  * (Mann–Whitney) with a single final division.
  *
  * Scale shapes: [[classificationReport]] is one (label, pred) hash
  * aggregate — L² rows no matter the corpus. [[rocAuc]] ranks
  * globally — an inherent total sort, the EXACT path for holdout-sized
  * frames (judged holdouts are thousands of rows, never the corpus);
  * [[rocAucBinned]] is the 100 TB path — one nBins-bounded hash
  * aggregate, trapezoidal within-bin tie handling, error ≤ 1/nBins
  * (spec-gated, the `approxDistinct` tolerance posture).
  */
object Eval {

  /** Per-label classification report from (labelCol, predCol) rows:
    * (label, support, tp, fp, fn, precision, recall, f1), one row per
    * label seen in truth or predictions, ordered by label. Zero
    * denominators yield 0.0 (the sklearn `zero_division=0` posture).
    * Overall accuracy = sum(tp) / sum(support) — derivable, not a row.
    */
  def classificationReport(df: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    // the pair table has THREE consumers (per-truth rollup, per-pred
    // rollup, and their join) — spill it eagerly so the upstream
    // classifier subtree plans ONCE (the q159 multi-consumer
    // discipline); L x L rows, label-bounded no matter the corpus
    val pairs = graft.io.Spill(
      df.select(col(labelCol).cast("string").as("__t"),
          col(predCol).cast("string").as("__p"))
        .groupBy(col("__t"), col("__p")).agg(count(lit(1)).as("__n")),
      "graft-eval-pairs-")
    val byTruth = pairs.groupBy(col("__t").as("label")).agg(
      sum(col("__n")).as("support"),
      sum(when(col("__p") === col("__t"), col("__n"))
        .otherwise(0L)).as("tp"))
    val byPred = pairs.where(col("__p") =!= col("__t"))
      .groupBy(col("__p").as("label")).agg(sum(col("__n")).as("fp"))
    def ratio(num: Column, den: Column) =
      when(den > 0, round(num.cast("double") / den.cast("double"), 6))
        .otherwise(0.0)
    byTruth.join(byPred, Seq("label"), "full")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("fp"), lit(0L)).as("fp"),
        (coalesce(col("support"), lit(0L)) -
          coalesce(col("tp"), lit(0L))).as("fn"))
      .select(col("label"), col("support"), col("tp"), col("fp"),
        col("fn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("support")).as("recall"),
        ratio(col("tp") * 2, col("tp") * 2 + col("fp") + col("fn"))
          .as("f1"))
      .orderBy(col("label"))
  }

  /** Exact ROC-AUC of `scoreCol` against boolean `labelCol`:
    * one row (n_pos, n_neg, auc), auc rounded to 6. Tie-corrected
    * Mann–Whitney in INTEGER rank math — with ascending min-rank r and
    * tie-group size c, a row's doubled average rank is `2r + c - 1`;
    * `auc = (Σ_pos(2r+c-1) - nPos(nPos+1)) / (2 nPos nNeg)` — one
    * double division at the end. Degenerate frames (no positives or no
    * negatives) yield NULL auc rather than a fabricated number.
    */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val w = Window.orderBy(col("__s"))
    val ranked = df.select(col(labelCol).cast("boolean").as("__y"),
        col(scoreCol).cast("double").as("__s"))
      .select(col("__y"),
        (rank().over(w).cast("long") * 2 +
          count(lit(1)).over(Window.partitionBy(col("__s"))) - 1)
          .as("__r2"))
    ranked.agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("n_neg"),
        sum(when(col("__y"), col("__r2")).otherwise(0L)).as("__s2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("__s2") - col("n_pos") * (col("n_pos") + 1))
            .cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"), 6))
          .as("auc"))
  }

  /** Binned ROC-AUC — the corpus-scale path: scores clamp onto an
    * `nBins` grid over [lo, hi] (one hash aggregate, nBins rows), AUC
    * from cumulative bin counts with the trapezoidal within-bin term
    * `pos_b (2 cumNegBelow_b + neg_b)` — the same doubled-rank algebra
    * as [[rocAuc]] with "tied" meaning "same bin", so it equals the
    * exact AUC whenever each distinct score owns its bin and is within
    * 1/nBins otherwise.
    */
  def rocAucBinned(df: DataFrame, labelCol: String, scoreCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val bins = df.select(col(labelCol).cast("boolean").as("__y"),
        least(greatest(
          floor((col(scoreCol).cast("double") - lo) / (hi - lo) * nBins)
            .cast("long"), lit(0L)), lit(nBins - 1L)).as("__b"))
      .groupBy(col("__b")).agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__n"))
    // nBins-bounded frame: the cumulative window is driver-cheap
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins.select(col("__p"), col("__n"),
        (sum(col("__n")).over(w) - col("__n")).as("__cnb"))
      .agg(sum(col("__p")).as("n_pos"), sum(col("__n")).as("n_neg"),
        sum(col("__p") * (col("__cnb") * 2 + col("__n"))).as("__s2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("__s2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double"), 6))
          .as("auc"))
  }

  /** Exact average precision (the PR-curve area by the step
    * convention): `AP = (1/nPos) Σ_{k: y_k} precision@k` over the
    * ranking by (score DESC, tieCol ASC — an explicit deterministic
    * tiebreak column, because AP is order-sensitive where ROC-AUC's
    * rank correction is not). Each `precision@k = pos@k / k` term is
    * computed in FIXED-POINT integer division (`pos@k · 10^12 div k` —
    * floor, bit-identical across engines), the terms sum as longs, and
    * ONE double division + round(6) lands the result — the same
    * exactness contract as [[rocAuc]], with the same judged-holdout
    * size contract (pos@k · 10^12 must fit a long). One row:
    * (n_pos, n_ranked, ap); NULL ap when there are no positives.
    */
  def averagePrecision(df: DataFrame, labelCol: String, scoreCol: String,
      tieCol: String): DataFrame = {
    val w = Window.orderBy(col("__s").desc, col("__t"))
    df.select(col(labelCol).cast("boolean").as("__y"),
        col(scoreCol).cast("double").as("__s"), col(tieCol).as("__t"))
      .select(col("__y"),
        row_number().over(w).cast("long").as("__k"),
        sum(when(col("__y"), 1L).otherwise(0L)).over(w).as("__pk"))
      .agg(sum(when(col("__y"), 1L).otherwise(0L)).as("n_pos"),
        count(lit(1)).as("n_ranked"),
        sum(when(col("__y"),
          expr("(__pk * 1000000000000L) div __k")).otherwise(0L))
          .as("__ts"))
      .select(col("n_pos"), col("n_ranked"),
        when(col("n_pos") > 0,
          round(col("__ts").cast("double") /
            (col("n_pos").cast("double") * 1e12), 6)).as("ap"))
  }

  /** Cohen's kappa between two raters' labels — chance-corrected
    * agreement, the audit for "does the cheap heuristic agree with the
    * learned model" (gate substitution) and for LLM-judge/annotator
    * consistency before judged data trains anything. One row:
    * (n, po, pe, kappa) with `po` observed agreement, `pe` the chance
    * agreement from the margin products, `kappa = (po-pe)/(1-pe)`;
    * integer counts, three correctly-rounded divisions, rounding only
    * at the output — bit-replayable. Degenerate total agreement with
    * pe = 1 (both raters constant) yields NULL kappa.
    *
    * Scale: the pair table is label-bounded (L² rows from one hash
    * aggregate, spilled once for its consumers); the margin-product
    * numerator is long arithmetic — judged-holdout-sized inputs by
    * contract (n² must fit a long).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val pairs = graft.io.Spill(
      df.select(col(aCol).cast("string").as("__a"),
          col(bCol).cast("string").as("__b"))
        .groupBy(col("__a"), col("__b")).agg(count(lit(1)).as("__n")),
      "graft-kappa-")
    val tot = pairs.agg(sum(col("__n")).as("n"),
      sum(when(col("__a") === col("__b"), col("__n")).otherwise(0L))
        .as("__d"))
    val ra = pairs.groupBy(col("__a")).agg(sum(col("__n")).as("__ra"))
    val rb = pairs.groupBy(col("__b")).agg(sum(col("__n")).as("__rb"))
    val pe = ra.join(rb, col("__a") === col("__b"))
      .agg(coalesce(sum(col("__ra") * col("__rb")), lit(0L)).as("__pn"))
    val po = col("__d").cast("double") / col("n").cast("double")
    val peV = col("__pn").cast("double") /
      (col("n") * col("n")).cast("double")
    tot.crossJoin(pe) // two one-row frames
      .select(col("n"), round(po, 6).as("po"), round(peV, 6).as("pe"),
        when(peV < 1.0, round((po - peV) / (lit(1.0) - peV), 6))
          .as("kappa"))
  }

  /** Reliability diagram data: per score-bin (bin, n, mean_score,
    * pos_rate) — is "0.9 confident" right 90% of the time? One
    * nBins-bounded hash aggregate; mean_score stays exact via a
    * DECIMAL sum before its single division.
    */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    df.select(col(labelCol).cast("boolean").as("__y"),
        col(scoreCol).cast("double").as("__s"))
      .select(col("__y"), col("__s"),
        least(greatest(
          floor((col("__s") - lo) / (hi - lo) * nBins).cast("long"),
          lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_score"),
        round(sum(when(col("__y"), 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as("pos_rate"))
      .orderBy(col("bin"))
  }
}
