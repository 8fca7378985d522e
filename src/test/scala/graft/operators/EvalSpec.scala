package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Classifier evaluation: hand-computed report counts and ratios,
  * tie-corrected exact AUC, binned-AUC equivalence and tolerance, and
  * calibration bins.
  */
class EvalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def scored(rows: (Boolean, Double)*) = {
    import spark.implicits._
    rows.toDF("y", "s")
  }

  private def auc(rows: (Boolean, Double)*): Double =
    Eval.rocAuc(scored(rows: _*), "y", "s").head().getDouble(2)

  test("classification report: hand-computed counts, a label seen " +
      "only in predictions, and zero-division posture") {
    import spark.implicits._
    val df = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"),   // en: tp=2 fn=1
      ("de", "de"), ("de", "xx"),                 // de: tp=1 fn=1, fp=1(en->de)
      ("fr", "en"))                               // fr: tp=0; en fp=1; xx fp=1
      .toDF("truth", "pred")
    val out = Eval.classificationReport(df, "truth", "pred").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    out shouldBe Array(
      ("de", 2L, 1L, 1L, 1L, 0.5, 0.5, 0.5),
      ("en", 3L, 2L, 1L, 1L, 0.666667, 0.666667, 0.666667),
      ("fr", 1L, 0L, 0L, 1L, 0.0, 0.0, 0.0),   // nothing predicted fr
      ("xx", 0L, 0L, 1L, 0L, 0.0, 0.0, 0.0))   // prediction-only label
    // overall accuracy is derivable: sum(tp) / sum(support)
    out.map(_._3).sum.toDouble / out.map(_._2).sum shouldBe 0.5
  }

  test("exact AUC: perfect = 1, reversed = 0, constant scores = 0.5, " +
      "ties take the corrected value") {
    auc((true, 0.9), (true, 0.8), (false, 0.2), (false, 0.1)) shouldBe 1.0
    auc((false, 0.9), (false, 0.8), (true, 0.2), (true, 0.1)) shouldBe 0.0
    auc((true, 0.5), (false, 0.5), (true, 0.5), (false, 0.5)) shouldBe 0.5
    // hand: U = (0.2 beats 0.1) + (0.2 ties 0.2)/2 + (0.3 beats both)
    //         = 1.5 + 2 = 3.5; AUC = 3.5 / (2*2)
    auc((false, 0.1), (true, 0.2), (false, 0.2), (true, 0.3)) shouldBe 0.875
    // degenerate: one class only -> NULL, not a fabricated number
    Eval.rocAuc(scored((true, 0.5), (true, 0.7)), "y", "s")
      .head().isNullAt(2) shouldBe true
  }

  test("binned AUC equals exact when each distinct score owns a bin, " +
      "stays within 1/nBins otherwise, and clamps out-of-range scores") {
    val rows = Seq((false, 0.125), (true, 0.375), (false, 0.375),
      (true, 0.625), (false, 0.625), (true, 0.875))
    val exact = auc(rows: _*)
    Eval.rocAucBinned(scored(rows: _*), "y", "s", 0.0, 1.0, 4)
      .head().getDouble(2) shouldBe exact
    // a spread fixture: 64 bins must land within 1/64 of exact
    val spread = (1 to 200).map { i =>
      val s = (i * 37 % 101) / 101.0
      (s + (i % 7) / 40.0 > 0.7, s)
    }
    val e2 = auc(spread: _*)
    val b2 = Eval.rocAucBinned(scored(spread: _*), "y", "s", 0.0, 1.0, 64)
      .head().getDouble(2)
    math.abs(b2 - e2) should be <= (1.0 / 64)
    // out-of-range scores clamp to the edge bins instead of vanishing
    val cl = Eval.rocAucBinned(scored((true, 1.9), (false, -0.5)),
      "y", "s", 0.0, 1.0, 10).head()
    cl.getLong(0) shouldBe 1L
    cl.getLong(1) shouldBe 1L
    cl.getDouble(2) shouldBe 1.0
  }

  test("average precision: hand-computed step-convention area, " +
      "deterministic tiebreak, degenerate no-positives") {
    import spark.implicits._
    def ap(rows: (Boolean, Double, Long)*): org.apache.spark.sql.Row =
      Eval.averagePrecision(rows.toDF("y", "s", "id"), "y", "s", "id")
        .head()
    // ranking desc: y = 1,0,1,1,0 -> AP = (1 + 2/3 + 3/4) / 3
    val r = ap((true, 0.9, 1L), (false, 0.8, 2L), (true, 0.7, 3L),
      (true, 0.6, 4L), (false, 0.5, 5L))
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Long]("n_ranked") shouldBe 5L
    r.getAs[Double]("ap") shouldBe 0.805556
    // perfect ranking -> 1.0; all-negative -> NULL
    ap((true, 0.9, 1L), (true, 0.8, 2L), (false, 0.1, 3L))
      .getAs[Double]("ap") shouldBe 1.0
    ap((false, 0.9, 1L), (false, 0.8, 2L)).isNullAt(2) shouldBe true
    // equal scores: the tie column decides — id 1 positive first vs
    // id re-labeled so the positive ranks second
    ap((true, 0.5, 1L), (false, 0.5, 2L)).getAs[Double]("ap") shouldBe 1.0
    ap((false, 0.5, 1L), (true, 0.5, 2L)).getAs[Double]("ap") shouldBe 0.5
  }

  test("Cohen's kappa: hand-computed chance correction, perfect and " +
      "degenerate agreement") {
    import spark.implicits._
    // classic 2x2: a=(y,y,y,n,n,n,y,n,y,y), b agrees on 7 of 10
    val df = Seq(("y", "y"), ("y", "y"), ("y", "n"), ("n", "n"),
      ("n", "n"), ("n", "y"), ("y", "y"), ("n", "n"), ("y", "y"),
      ("y", "n")).toDF("a", "b")
    val r = Eval.cohenKappa(df, "a", "b").head()
    r.getAs[Long]("n") shouldBe 10L
    r.getAs[Double]("po") shouldBe 0.7
    // margins: a(y)=6, a(n)=4; b(y)=5, b(n)=5 -> pe = (30+20)/100
    r.getAs[Double]("pe") shouldBe 0.5
    r.getAs[Double]("kappa") shouldBe 0.4 +- 1e-9
    // perfect agreement with label variety -> kappa 1
    Eval.cohenKappa(Seq(("x", "x"), ("y", "y")).toDF("a", "b"),
      "a", "b").head().getAs[Double]("kappa") shouldBe 1.0
    // both raters constant: pe = 1, kappa undefined -> NULL
    Eval.cohenKappa(Seq(("x", "x"), ("x", "x")).toDF("a", "b"),
      "a", "b").head().isNullAt(3) shouldBe true
  }

  test("Brier score: perfect 0, maximally wrong 1, constant-half 0.25, " +
      "hand-computed mixed case, empty NULL") {
    def brier(rows: (Boolean, Double)*): org.apache.spark.sql.Row =
      Eval.brierScore(scored(rows: _*), "y", "s").head()
    brier((true, 1.0), (false, 0.0)).getDouble(1) shouldBe 0.0
    brier((true, 0.0), (false, 1.0)).getDouble(1) shouldBe 1.0
    brier((true, 0.5), (false, 0.5)).getDouble(1) shouldBe 0.25
    // hand: ((0.8-1)^2 + (0.3-0)^2) / 2 = (0.04 + 0.09) / 2 = 0.065
    brier((true, 0.8), (false, 0.3)).getDouble(1) shouldBe 0.065
    import spark.implicits._
    Eval.brierScore(Seq.empty[(Boolean, Double)].toDF("y", "s"), "y", "s")
      .head().isNullAt(1) shouldBe true
  }

  test("fixed-point micros equals BigDecimal HALF_UP at 6 decimals " +
      "across random and boundary-sitting ratios") {
    import spark.implicits._
    // deterministic pseudo-random pairs + constructed .5-micro
    // boundaries (n/d = (2m+1)k / (2·10⁶·k) sits EXACTLY on a half) —
    // the class of value where round(double, 6) diverged cross-engine
    // in r16
    val rng = new scala.util.Random(17)
    val random = Seq.fill(300)(
      (rng.nextLong().abs % 4000000000000L,
        rng.nextLong().abs % 1000000000L + 1))
    val boundary = (1 to 50).map { m =>
      val k = m % 7 + 1
      ((2L * m + 1) * k, 2000000L * k)
    }
    val pairs = random ++ boundary ++ Seq((0L, 1L), (1L, 1L),
      (4000000000000L, 1L), (1L, 2000000L), (3L, 2000000L))
    val got = pairs.toDF("n", "d")
      .select(col("n"), col("d"),
        Eval.fromMicros(Eval.micros(col("n"), col("d"))).as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.foreach { case (n, d, r) =>
      val want = (BigDecimal(n) / BigDecimal(d))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      withClue(s"$n/$d: ") { r shouldBe want }
    }
  }

  test("calibration bins: counts, mean score, and positive rate per bin") {
    val out = Eval.calibrationBins(scored(
        (false, 0.1), (false, 0.15), (true, 0.2),   // bin 0: 1/3 pos
        (true, 0.8), (true, 0.9), (false, 0.85),    // bin 1: 2/3 pos
        (true, 1.5)),                               // clamps into bin 1
      "y", "s", 0.0, 1.0, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    out shouldBe Array(
      (0L, 3L, 0.15, 0.333333),
      (1L, 4L, 1.0125, 0.75))
  }
}
