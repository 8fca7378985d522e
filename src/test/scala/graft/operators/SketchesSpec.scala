package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sketch-table pre-aggregation: rollups over stored sketches must track
  * exact distinct counts within HLL error, at every re-aggregation grain.
  */
class SketchesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private lazy val events =
    graft.core.Tables.load(spark, "/root/testdata/sf0.01", "events")

  test("per-type sketch table rolls up to exact-tracking distinct counts") {
    val sk = Sketches.hllSketchTable(events, "user_id", lgK = 14, "event_type")

    // per-grain estimates vs exact
    val est = Sketches.hllRollup(sk, "event_type")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.keySet shouldBe est.keySet
    exact.foreach { case (k, ex) =>
      est(k).toDouble should be(ex.toDouble +- math.max(2.0, ex * 0.05))
    }
  }

  test("union across grains equals a sketch built from all raw data (mergeability)") {
    val sk = Sketches.hllSketchTable(events, "user_id", lgK = 14, "event_type")
    val unioned = Sketches.hllRollup(sk).head().getLong(0)
    val direct = Sketches.hllRollup(
      Sketches.hllSketchTable(events, "user_id", lgK = 14)).head().getLong(0)
    // same lgK, same values => identical sketch state, identical estimate
    unioned shouldBe direct
    val exact = events.select(count_distinct(col("user_id"))).head().getLong(0)
    unioned.toDouble should be(exact.toDouble +- exact * 0.05)
  }

  test("row counts survive the rollup exactly") {
    val sk = Sketches.hllSketchTable(events, "user_id", lgK = 12, "event_type")
    Sketches.hllRollup(sk).head().getLong(1) shouldBe events.count()
  }

  test("CMS table answers point frequencies within the one-sided bound") {
    val total = events.count()
    val sk = Sketches.cmsSketchTable(events, "user_id",
      eps = 0.0001, confidence = 0.99, "event_type")
    val exact = events.groupBy(col("user_id")).count()
      .orderBy(col("count").desc).limit(5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.cmsLookup(sk, exact.keys.toSeq)
    exact.foreach { case (k, ex) =>
      val e = est(k)
      e should be >= ex // CMS never underestimates
      e should be <= ex + math.max(4L, (2 * 0.0001 * total).toLong)
    }
    // a key that never appeared estimates ~0 (within the additive bound)
    Sketches.cmsLookup(sk, Seq(-999999L))(-999999L) should
      be <= math.max(4L, (2 * 0.0001 * total).toLong)
  }

  test("corpus-overlap estimate tracks the exact shingle Jaccard and " +
      "containment on planted overlap; disjoint corpora estimate ~0") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.01",
      "documents")
    // corpus A: docs 0,1,2 mod 4; corpus B: docs 0 mod 4 (planted
    // subset) plus 3 mod 4 (novel) — material but partial overlap
    val a = docs.where(col("doc_id") % 4 =!= 3)
    val b = docs.where(col("doc_id") % 4 === 0 || col("doc_id") % 4 === 3)
    val est = Sketches.corpusOverlapEstimate(a, b, "text").collect()(0)
    // exact reference over the same distinct-shingle sets
    def shingles(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.words(col("text")), 3)).as("sh"))
        .distinct().collect().map(_.getString(0)).toSet
    val (sa, sb) = (shingles(a), shingles(b))
    val inter = (sa & sb).size.toDouble
    val exactJ = inter / (sa | sb).size
    val exactC = inter / sb.size
    // subtraction stacks the sketch errors: gate at a loose multiple
    // of the lgK=14 bound (~1.2% per sketch), not the single-sketch one
    est.getAs[Long]("a_distinct").toDouble shouldBe
      sa.size.toDouble +- (0.05 * sa.size)
    est.getAs[Long]("b_distinct").toDouble shouldBe
      sb.size.toDouble +- (0.05 * sb.size)
    est.getAs[Double]("jaccard_est") shouldBe exactJ +- 0.1
    est.getAs[Double]("containment_b_est") shouldBe exactC +- 0.1
    exactJ should be > 0.1 // the planted overlap is material
    // disjoint corpora: intersection clamps to ~0
    val c = docs.where(col("doc_id") % 4 === 1)
    val d = docs.where(col("doc_id") % 4 === 2)
    val dj = Sketches.corpusOverlapEstimate(c, d, "text").collect()(0)
    val exactDj = {
      val (sc, sd) = (shingles(c), shingles(d))
      (sc & sd).size.toDouble / (sc | sd).size
    }
    dj.getAs[Double]("jaccard_est") shouldBe exactDj +- 0.1
  }
}
