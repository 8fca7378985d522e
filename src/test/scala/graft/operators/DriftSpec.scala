package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Token JSD drift: hand-computed contributions, the identical and
  * disjoint boundary cases, and partitioning invariance.
  */
class DriftSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
  }

  private def jsd(a: Seq[String], b: Seq[String], k: Int = 100,
      parts: Int = 3): Seq[(String, Long, Long, Double)] =
    Drift.tokenJsd(df(a: _*).repartition(parts), df(b: _*).repartition(parts),
        "text", k)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq

  test("hand-computed contributions on a two-token drift") {
    // a: p(x)=2/3 p(y)=1/3; b: p(x)=1/3 p(y)=2/3 — symmetric, so both
    // tokens contribute 0.5*(2/3*log2(4/3) + 1/3*log2(2/3)) = 0.040852
    val out = jsd(Seq("x x y"), Seq("x y y"))
    out.map(_._1).sorted shouldBe Seq("x", "y")
    out.foreach(_._4 shouldBe 0.040852)
    out.find(_._1 == "x").get._2 shouldBe 2L // cnt_a
    out.find(_._1 == "x").get._3 shouldBe 1L // cnt_b
  }

  test("identical slices have zero drift; disjoint slices sum to 1 bit") {
    jsd(Seq("a b c a"), Seq("a b c a")).foreach(_._4 shouldBe 0.0)
    val disjoint = jsd(Seq("a a b"), Seq("c d d"))
    disjoint.map(_._4).sum shouldBe 1.0 +- 1e-5
  }

  private def cos(a: Seq[Seq[Float]], b: Seq[Seq[Float]],
      parts: Int = 2): (Long, Long, Double) = {
    import spark.implicits._
    val da = a.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding").repartition(parts)
    val db = b.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding").repartition(parts)
    val r = Drift.embeddingCentroidCos(da, db, "embedding").collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("centroid cosine: identical, orthogonal, opposite, and mixed slices") {
    cos(Seq(Seq(1f, 2f), Seq(3f, 4f)), Seq(Seq(1f, 2f), Seq(3f, 4f)))._3 shouldBe 1.0
    cos(Seq(Seq(1f, 0f)), Seq(Seq(0f, 1f)))._3 shouldBe 0.0
    cos(Seq(Seq(1f, 0f)), Seq(Seq(-2f, 0f)))._3 shouldBe -1.0
    // centroids (1,1) vs (2,0): 2 / (sqrt(2)*2) = 0.707107
    val (na, nb, c) = cos(Seq(Seq(1f, 0f), Seq(1f, 2f)), Seq(Seq(2f, 0f)))
    (na, nb) shouldBe ((2L, 1L))
    c shouldBe 0.707107
  }

  test("centroid cosine is partitioning-invariant") {
    val a = (1 to 40).map(i => Seq(i.toFloat, (i % 7).toFloat, 1f))
    val b = (1 to 30).map(i => Seq((i % 5).toFloat, i.toFloat, 2f))
    val ref = cos(a, b, parts = 1)
    (2 to 4).foreach(p => cos(a, b, p) shouldBe ref)
  }

  test("result (including the top-k cutoff) is partitioning-invariant") {
    val a = (1 to 50).map(i => s"tok$i common common")
    val b = (26 to 75).map(i => s"tok$i common rare$i")
    val ref = jsd(a, b, k = 10, parts = 1)
    ref should have length 10
    (2 to 4).foreach(p => jsd(a, b, k = 10, parts = p) shouldBe ref)
  }
}
