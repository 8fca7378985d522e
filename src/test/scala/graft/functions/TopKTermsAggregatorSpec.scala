package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bounded top-k TERMS aggregator (the string-payload TopKAggregator
  * used by significant-terms mining): equality with the sort-everything
  * idiom on arbitrary inputs including score ties, merge-order
  * invariance via repartitioning, and the k bound — the buffer must
  * stay at k entries so a vocabulary-sized candidate set cannot
  * materialize in one reducer row.
  */
class TopKTermsAggregatorSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def viaAggregator(rows: Seq[(String, Long, String)], k: Int,
      parts: Int): Map[String, Seq[(Long, String)]] = {
    import spark.implicits._
    val topk = udaf(new TopKTermsAggregator(k))
    rows.toDF("g", "micros", "term").repartition(parts)
      .groupBy(col("g")).agg(topk(col("micros"), col("term")).as("top"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (p.getLong(0), p.getString(1))).toSeq)
      .toMap
  }

  private def viaSort(rows: Seq[(String, Long, String)],
      k: Int): Map[String, Seq[(Long, String)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct
        .sortBy(r => (-r._1, r._2)).take(k)
    }

  test("matches the sort-everything idiom on arbitrary inputs, any " +
      "partitioning (micros DESC, term ASC)") {
    val rowsGen = Gen.choose(1, 80).flatMap(n => Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b")
      micros <- Gen.oneOf(Gen.choose(-50L, 50L), Gen.oneOf(1L, 2L)) // ties likely
      term <- Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
        "zeta", "eta", "theta")
    } yield (g, micros, term)).map(_.distinctBy(r => (r._1, r._3))))
    val prop = Prop.forAll(rowsGen, Gen.choose(1, 13)) { (rows, parts) =>
      viaAggregator(rows, k = 3, parts) == viaSort(rows, k = 3)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("groups smaller than k return all their pairs, ranked, scores attached") {
    val out = viaAggregator(
      Seq(("a", 10L, "x"), ("a", 30L, "y")), k = 5, parts = 2)
    out("a") shouldBe Seq((30L, "y"), (10L, "x"))
  }

  test("score ties break lexicographically on term under any partitioning") {
    val rows = Seq(("a", 7L, "zebra"), ("a", 7L, "ant"), ("a", 7L, "mid"))
    (1 to 4).foreach { parts =>
      viaAggregator(rows, k = 2, parts)("a") shouldBe
        Seq((7L, "ant"), (7L, "mid"))
    }
  }

  test("tiebreak is UTF-8 byte order above the BMP, not UTF-16 code units") {
    // U+FFFD (3 UTF-8 bytes, BMP) vs U+10000 (4 bytes, supplementary,
    // a surrogate pair in UTF-16): JVM compareTo puts the surrogate
    // (0xD800) BEFORE 0xFFFD, but UTF-8 bytes / code points order
    // U+FFFD first — the order DuckDB's ORDER BY produces.
    val bmp = "�"
    val astral = new String(Character.toChars(0x10000))
    val agg = new TopKTermsAggregator(1)
    // sanity: the JVM order really does invert here
    assert(astral.compareTo(bmp) < 0)
    val out = agg.finish(agg.reduce(agg.reduce(agg.zero, (5L, astral)),
      (5L, bmp)))
    out shouldBe Seq((5L, bmp))
  }

  test("the buffer never exceeds k entries while reducing a large stream") {
    // direct Aggregator-API exercise: feed 10k rows through one buffer
    // and assert the invariant the OOM-safety claim rests on
    val agg = new TopKTermsAggregator(4)
    var buf = agg.zero
    (1 to 10000).foreach { i =>
      buf = agg.reduce(buf, (i.toLong % 997, s"t$i"))
      buf.size should be <= 4
    }
    buf.map(_._1) shouldBe buf.map(_._1).sorted(Ordering[Long].reverse)
    val merged = agg.merge(buf, (1 to 1000).map(i => (2000L + i, s"m$i")).toVector)
    merged.size shouldBe 4
    merged.head._1 shouldBe 3000L
  }
}
