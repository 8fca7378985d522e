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
  * Everything is exact and oracle-replayable: counts are integers, and
  * every 6-decimal ratio is computed as HALF-UP MICROS IN PURE LONG
  * ARITHMETIC — `(num·2·10⁶ + den) div (2·den)` — followed by one
  * exact `/1e6` division (micros < 2^52 are exact doubles). Never
  * `round(double, 6)`: Spark rounds the double's shortest decimal
  * representation (`BigDecimal.valueOf`) where DuckDB scales the
  * binary double by 10⁶, and they disagree on boundary ratios — the
  * r16 q172/q173 defect. F1 goes via its count identity
  * `2tp / (2tp+fp+fn)` — never the p/r composition, whose
  * intermediate rounding compounds. The exact AUC uses tie-corrected
  * integer rank sums (Mann–Whitney) with the same single fixed-point
  * finish. Size contract: `num·2·10⁶` must fit a long, i.e. every
  * count numerator ≤ ~4.6·10¹² — judged holdouts by construction.
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

  /** Delegates to [[graft.functions.FixedPoint]] — the battery-wide
    * single definition of the half-up-micros discipline.
    */
  private[operators] def micros(num: Column, den: Column): Column =
    graft.functions.FixedPoint.micros(num, den)

  private[operators] def fromMicros(m: Column): Column =
    graft.functions.FixedPoint.fromMicros(m)

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
      when(den > 0, fromMicros(micros(num, den))).otherwise(0.0)
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
          fromMicros(micros(
            col("__s2") - col("n_pos") * (col("n_pos") + 1),
            col("n_pos") * col("n_neg") * 2)))
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
          fromMicros(micros(col("__s2"),
            col("n_pos") * col("n_neg") * 2)))
          .as("auc"))
  }

  /** Exact average precision (the PR-curve area by the step
    * convention): `AP = (1/nPos) Σ_{k: y_k} precision@k` over the
    * ranking by (score DESC, tieCol ASC — an explicit deterministic
    * tiebreak column, because AP is order-sensitive where ROC-AUC's
    * rank correction is not). Each `precision@k = pos@k / k` term is
    * computed in FIXED-POINT integer division (`pos@k · 10^12 div k` —
    * floor, bit-identical across engines), the terms sum as longs, and
    * ONE fixed-point half-up division lands the result — the same
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
        // ap micros = half-up of __ts/(n_pos·10¹²) at 6 decimals
        // ≡ (2·__ts + n_pos·10⁶) div (2·n_pos·10⁶) — the generic
        // micros() helper would overflow (__ts·2·10⁶ > 2^63 already at
        // thousands of ranked rows); this form holds to __ts < 2^62
        when(col("n_pos") > 0,
          fromMicros(call_function("div",
            col("__ts") * 2 + col("n_pos") * 1000000L,
            col("n_pos") * 2000000L))).as("ap"))
  }

  /** Cohen's kappa between two raters' labels — chance-corrected
    * agreement, the audit for "does the cheap heuristic agree with the
    * learned model" (gate substitution) and for LLM-judge/annotator
    * consistency before judged data trains anything. One row:
    * (n, po, pe, kappa) with `po` observed agreement, `pe` the chance
    * agreement from the margin products; integer counts, each output a
    * single fixed-point long division: po = d/n and pe = pn/n² as
    * half-up micros, and kappa from its INTEGER identity
    * `(d·n − pn) / (n² − pn)` — a possibly-negative numerator, so the
    * micros are computed on |num| and the sign multiplied back (both
    * engines truncate integral division toward zero; keeping operands
    * non-negative sidesteps the floor-vs-truncate question entirely).
    * Degenerate total agreement with pe = 1 (both raters constant)
    * yields NULL kappa.
    *
    * Scale: the pair table is label-bounded (L² rows from one hash
    * aggregate, spilled once for its consumers); the margin-product
    * numerator is long arithmetic — judged-holdout-sized inputs by
    * contract (n²·2·10⁶ must fit a long: n ≤ ~2.1M rated rows).
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
    val kNum = col("__d") * col("n") - col("__pn") // signed
    val kDen = col("n") * col("n") - col("__pn")   // > 0 iff pe < 1
    val kMag = micros(abs(kNum), kDen)
    tot.crossJoin(pe) // two one-row frames
      .select(col("n"),
        when(col("n") > 0, fromMicros(micros(col("__d"), col("n"))))
          .as("po"),
        when(col("n") > 0,
          fromMicros(micros(col("__pn"), col("n") * col("n"))))
          .as("pe"),
        when(kDen > 0,
          fromMicros(when(kNum < 0, -kMag).otherwise(kMag)))
          .as("kappa"))
  }

  /** Reliability diagram data: per score-bin (bin, n, mean_score,
    * pos_rate) — is "0.9 confident" right 90% of the time? One
    * nBins-bounded hash aggregate. Fixed-point discipline: each score
    * is quantized to half-up micros AT THE ROW (`round(s·10⁶)` — both
    * engines round the IDENTICAL IEEE double product to an integer,
    * which is cross-engine safe because k+0.5 is exactly representable
    * and any other double is ≥ 1 ulp from a boundary), the micros sum
    * as longs, and mean_score is one long division — so mean_score is
    * exactly the mean of the 6-decimal-quantized scores, documented as
    * such. pos_rate is a pure count ratio.
    */
  def calibrationBins(df: DataFrame, labelCol: String, scoreCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
    val binned = df.select(col(labelCol).cast("boolean").as("__y"),
        col(scoreCol).cast("double").as("__s"))
      .select(col("__y"),
        round(col("__s") * 1e6).cast("long").as("__sm"),
        least(greatest(
          floor((col("__s") - lo) / (hi - lo) * nBins).cast("long"),
          lit(0L)), lit(nBins - 1L)).as("bin"))
      .groupBy(col("bin")).agg(
        count(lit(1)).as("n"),
        sum(col("__sm")).as("__ss"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__pos"))
    // mean micros = half-up of __ss/n with a possibly-negative sum:
    // micros on |__ss|, sign multiplied back (the cohenKappa posture)
    val mMag = call_function("div",
      abs(col("__ss")) * 2 + col("n"), col("n") * 2)
    binned.select(col("bin"), col("n"),
        fromMicros(when(col("__ss") < 0, -mMag).otherwise(mMag))
          .as("mean_score"),
        fromMicros(micros(col("__pos"), col("n"))).as("pos_rate"))
      .orderBy(col("bin"))
  }

  /** Brier score — the proper scoring rule beside [[calibrationBins]]'
    * reliability view: mean squared gap between the (micro-quantized)
    * score and the 0/1 outcome, one row (n, brier). Fixed-point
    * throughout: per-row gap `sm − y·10⁶` in micros, squared and
    * summed as longs, ONE half-up division at the end —
    * `brier·10⁶ = (2·Σgap² + n·10⁶) div (2·n·10⁶)`. Perfect
    * confident predictions score 0, maximally wrong ones 1, the
    * constant 0.5 scorer 0.25. Size contract: Σgap² ≤ n·10¹² must
    * leave room for ·2 — judged holdouts ≤ ~4.6M rows.
    */
  def brierScore(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val gap = round(col(scoreCol).cast("double") * 1e6).cast("long") -
      when(col(labelCol).cast("boolean"), 1000000L).otherwise(0L)
    df.select(gap.as("__g"))
      .agg(count(lit(1)).as("n"), sum(col("__g") * col("__g")).as("__ss"))
      .select(col("n"),
        when(col("n") > 0, fromMicros(call_function("div",
          col("__ss") * 2 + col("n") * 1000000L,
          col("n") * 2000000L))).as("brier"))
  }
}
