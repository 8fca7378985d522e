package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** PageRank: hand-computed ranks on a tiny graph (including a dangling
  * sink), the cycle fixed point, and partitioning invariance (the
  * decimal-sum determinism the operator promises).
  */
class GraphsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
      parts: Int = 3): Map[Long, Double] = {
    import spark.implicits._
    Graphs.pageRank(edges.toDF("src", "dst").repartition(parts), iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("one hand-computed step with a dangling sink") {
    // 1->2, 1->3, 2->3; node 3 dangles. N=3, r0=1/3 each.
    // r1(1) = 0.15/3                      = 0.05
    // r1(2) = 0.05 + 0.85*(1/3)/2         = 0.19166...
    // r1(3) = 0.05 + 0.85*((1/3)/2 + 1/3) = 0.475
    val r = ranks(Seq((1L, 2L), (1L, 3L), (2L, 3L)), iters = 1)
    r(1L) shouldBe 0.05 +- 1e-12
    r(2L) shouldBe (0.05 + 0.85 / 6) +- 1e-12
    r(3L) shouldBe 0.475 +- 1e-12
  }

  test("a cycle is the uniform fixed point") {
    val r = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 4)
    r.values.foreach(_ shouldBe (1.0 / 3) +- 1e-9)
  }

  test("ranks are bit-identical under any partitioning") {
    val edges = for (s <- 1L to 12L; d <- 1L to 12L
      if (s * 7 + d) % 3 == 0 && s != d) yield (s, d)
    val ref = ranks(edges, iters = 3, parts = 1)
    (2 to 5).foreach { p =>
      ranks(edges, iters = 3, parts = p) shouldBe ref // exact ==
    }
  }

  test("duplicate edges collapse instead of double-counting") {
    val once = ranks(Seq((1L, 2L), (2L, 1L)), iters = 2)
    val dup = ranks(Seq((1L, 2L), (1L, 2L), (2L, 1L)), iters = 2)
    dup shouldBe once
  }
}
