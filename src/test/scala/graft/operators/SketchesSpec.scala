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
}
