package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The 100 TB twins of the exact battery aggregates: HLL distinct counting
  * and t-digest percentiles are not cross-engine hash-matchable (sketch
  * internals differ), so their accuracy is gated HERE against the exact
  * plans on the fixture instead of in the oracle battery (q54/q55 carry the
  * exact forms).
  */
class ApproxAggSpec extends AnyFunSuite with Matchers with SparkSpec {

  private lazy val li =
    graft.core.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")

  test("approx_count_distinct within 5% of exact per group") {
    val rows = li.groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      withClue(s"group ${r.getString(0)}: exact $exact approx $approx: ") {
        math.abs(approx - exact) / exact should be <= 0.05
      }
    }
  }

  test("approx_percentile within 1% of exact p50/p90 per group") {
    val rows = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, array(0.5, 0.9))").as("exact"),
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").as("approx"))
      .collect()
    rows should not be empty
    rows.foreach { r =>
      val exact = r.getSeq[Double](1)
      val approx = r.getSeq[Double](2)
      exact.zip(approx).foreach { case (e, a) =>
        withClue(s"group ${r.getString(0)}: exact $e approx $a: ") {
          math.abs(a - e) / e should be <= 0.01
        }
      }
    }
  }
}
