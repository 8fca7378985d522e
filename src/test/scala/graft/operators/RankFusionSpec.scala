package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** RRF fusion semantics (consensus beats a single first place, single-list
  * passthrough, deterministic ties) and the exact batched dense searcher's
  * parity with the single-query brute-force path.
  */
class RankFusionSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ranking(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "rank", "doc_id")
  }

  private def fused(rankings: Seq[org.apache.spark.sql.DataFrame], k: Int) =
    RankFusion.rrf(rankings, "doc_id", k)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def judged(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("query_id", "doc_id", "grade")
  }

  test("ndcgAtK matches a hand computation through the micros discipline") {
    // ranking: 5 (grade 3), 6 (unjudged), 7 (grade 1); judged-but-
    // missed: 8 (grade 2)
    val ranked = ranking((1L, 1L, 5L), (1L, 2L, 6L), (1L, 3L, 7L))
    val j = judged((1L, 5L, 3L), (1L, 7L, 1L), (1L, 8L, 2L))
    def c(grade: Long, rank: Long): Long =
      Math.round(BigDecimal((math.pow(2, grade) - 1) /
          (math.log(rank + 1.0) / math.log(2.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
    val dcg = c(3, 1) + c(1, 3)          // positions of docs 5 and 7
    val idcg = c(3, 1) + c(2, 2) + c(1, 3) // ideal: grades 3, 2, 1
    val want = BigDecimal(dcg.toDouble / idcg)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = RankFusion.ndcgAtK(ranked, j, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    out shouldBe Array((1L, want))
  }

  test("ndcgAtK boundaries: perfect order scores 1, all-tied grades " +
      "score 1 in any order, all-zero grades and judged-but-unretrieved " +
      "queries score 0, empty judgments yield no rows") {
    val ranked = ranking((1L, 1L, 5L), (1L, 2L, 6L),
      (2L, 1L, 5L), (2L, 2L, 6L), (3L, 1L, 9L))
    val j = judged(
      (1L, 5L, 2L), (1L, 6L, 1L),  // retrieved in ideal order
      (2L, 5L, 1L), (2L, 6L, 1L),  // tied grades: any order is ideal
      (3L, 5L, 0L),                // only zero grades -> 0, not 0/0
      (4L, 5L, 3L))                // judged, never retrieved
    val out = RankFusion.ndcgAtK(ranked, j, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    out shouldBe Array((1L, 1.0), (2L, 1.0), (3L, 0.0), (4L, 0.0))
    RankFusion.ndcgAtK(ranked, judged(), "doc_id", k = 5)
      .count() shouldBe 0L
  }

  test("ndcgAtK: conflicting duplicate judgments collapse to the max " +
      "grade instead of double-counting") {
    val ranked = ranking((1L, 1L, 5L))
    val messy = judged((1L, 5L, 1L), (1L, 5L, 3L)) // same pair, two grades
    RankFusion.ndcgAtK(ranked, messy, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))) shouldBe
      RankFusion.ndcgAtK(ranked, judged((1L, 5L, 3L)), "doc_id", k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("ndcgAtK: a doc repeated at two ranks in a messy candidate " +
      "frame counts once, at its best rank") {
    val clean = ranking((1L, 1L, 5L), (1L, 3L, 7L))
    val messy = ranking((1L, 1L, 5L), (1L, 3L, 7L), (1L, 4L, 5L))
    val j = judged((1L, 5L, 3L), (1L, 7L, 1L))
    RankFusion.ndcgAtK(messy, j, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))) shouldBe
      RankFusion.ndcgAtK(clean, j, "doc_id", k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
  }

  test("ndcgAtK respects k: a relevant doc below the cutoff neither " +
      "gains nor is demanded") {
    // at k=1 only position 1 counts on both sides: doc 5 (grade 1)
    // retrieved first vs ideal grade 2 -> (2^1-1)/(2^2-1)
    val ranked = ranking((1L, 1L, 5L), (1L, 2L, 8L))
    val j = judged((1L, 5L, 1L), (1L, 8L, 2L))
    val out = RankFusion.ndcgAtK(ranked, j, "doc_id", k = 1)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    out shouldBe Array((1L, BigDecimal(1.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("mrrAtK: first relevant rank reciprocates; misses score 0; " +
      "zero-grade judgments are not relevant") {
    val ranked = ranking(
      (1L, 1L, 9L), (1L, 2L, 9L), (1L, 3L, 5L), // first relevant at 3
      (2L, 1L, 6L),                             // relevant missed
      (3L, 1L, 7L))                             // only zero-grade judged
    val j = judged((1L, 5L, 1L), (2L, 5L, 2L), (3L, 7L, 0L))
    val out = RankFusion.mrrAtK(ranked, j, "doc_id", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // query 3 has no POSITIVE judgment -> excluded from the eval set
    out shouldBe Array((1L, 3L, 0.333333), (2L, 0L, 0.0))
    // k truncation: the rank-3 hit vanishes at k=2
    RankFusion.mrrAtK(ranked, j, "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1) shouldBe Array((1L, 0L, 0.0), (2L, 0L, 0.0))
  }

  test("a doc ranked 2nd by both lists beats a doc ranked 1st by one") {
    val a = ranking((1L, 1L, 100L), (1L, 2L, 200L))
    val b = ranking((1L, 1L, 300L), (1L, 2L, 200L))
    // 200: 2/(60+2) > 100 or 300: 1/(60+1)
    fused(Seq(a, b), k = 3) shouldBe Array(
      (1L, 1L, 200L), (1L, 2L, 100L), (1L, 3L, 300L))
  }

  test("hand-computed integer-micro scores decide the fused order") {
    val a = ranking((7L, 1L, 10L), (7L, 2L, 11L), (7L, 3L, 12L))
    val b = ranking((7L, 1L, 11L), (7L, 2L, 12L), (7L, 3L, 10L))
    def u(rank: Long) = math.round(1e9 / (60 + rank))
    val scores = Map(
      10L -> (u(1) + u(3)), 11L -> (u(2) + u(1)), 12L -> (u(3) + u(2)))
    val want = scores.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => (7L, (i + 1).toLong, id) }
    fused(Seq(a, b), k = 3) shouldBe want.toArray
  }

  test("fusing a single ranking preserves its order") {
    val a = ranking((1L, 1L, 5L), (1L, 2L, 9L), (1L, 3L, 2L))
    fused(Seq(a), k = 3) shouldBe Array((1L, 1L, 5L), (1L, 2L, 9L), (1L, 3L, 2L))
  }

  test("equal fused scores break to the ascending doc id") {
    // both docs appear at rank 1 in exactly one list each -> equal score
    val a = ranking((1L, 1L, 42L))
    val b = ranking((1L, 1L, 7L))
    fused(Seq(a, b), k = 2) shouldBe Array((1L, 1L, 7L), (1L, 2L, 42L))
  }

  test("queries fuse independently") {
    val a = ranking((1L, 1L, 10L), (2L, 1L, 20L))
    val b = ranking((2L, 1L, 21L))
    fused(Seq(a, b), k = 2) shouldBe Array(
      (1L, 1L, 10L), (2L, 1L, 20L), (2L, 2L, 21L))
  }

  test("batchExactTopK matches bruteForceTopK per query") {
    import spark.implicits._
    val embs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 3.1 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val probes = embs.where(col("vec_id") % 10 === 0)
    val batched = Similarity.batchExactTopK(embs, probes, "vec_id",
        "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    for (q <- Seq(0L, 10L, 20L)) {
      val brute = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
          q, k = 4)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      batched(q) shouldBe brute
    }
  }

  test("rankingRecall counts overlap per query against the reference") {
    val ref = ranking((1L, 1L, 10L), (1L, 2L, 11L), (1L, 3L, 12L),
      (2L, 1L, 20L), (3L, 1L, 30L))
    val cand = ranking(
      (1L, 1L, 11L), (1L, 2L, 99L), (1L, 3L, 12L), // 2 of 3 hit
      (9L, 1L, 90L)) // candidate-only query: ignored
    val out = RankFusion.rankingRecall(cand, ref, "doc_id")
      .orderBy(col("query_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    out shouldBe Array(
      (1L, 3L, 2L, 0.666667), // round(2/3, 6)
      (2L, 1L, 0L, 0.0),      // query absent from candidate -> recall 0
      (3L, 1L, 0L, 0.0))
  }

  test("rankingRecall is 1.0 when the candidate equals the reference") {
    val ref = ranking((1L, 1L, 10L), (1L, 2L, 11L))
    RankFusion.rankingRecall(ref, ref, "doc_id")
      .select("recall").collect().map(_.getDouble(0)) shouldBe Array(1.0)
  }

  // ---- MMR diversified selection (the q140 shape) ----

  private def mmrOf(cands: Seq[(Long, Long, Double, Seq[Double])], k: Int,
      lambda: Double) = {
    import spark.implicits._
    Similarity.mmrSelect(
        cands.toDF("query_id", "vec_id", "rel", "emb"),
        "vec_id", "rel", "emb", k, lambda)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
  }

  test("MMR trades a near-duplicate for a diverse lower-relevance pick") {
    val e1 = Seq(1.0, 0.0, 0.0)
    val cands = Seq(
      (1L, 10L, 0.95, e1),                    // top pick
      (1L, 11L, 0.94, Seq(0.999, 0.01, 0.0)), // near-dup of 10
      (1L, 12L, 0.60, Seq(0.0, 1.0, 0.0)))    // diverse
    mmrOf(cands, k = 2, lambda = 0.5) shouldBe Array(
      (1L, 1L, 10L), (1L, 2L, 12L))
    // pure-relevance degenerate case keeps the near-dup
    mmrOf(cands, k = 2, lambda = 1.0) shouldBe Array(
      (1L, 1L, 10L), (1L, 2L, 11L))
  }

  test("MMR matches a from-the-definition greedy replication") {
    val rnd = new scala.util.Random(7)
    val cands = (0 until 12).map { i =>
      (5L, i.toLong, rnd.nextDouble(),
        Seq.fill(4)(rnd.nextDouble() * 2 - 1))
    }
    val lam = 0.5
    // independent replication in plain Scala
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      dot / (na * nb)
    }
    def m4(x: Double): Long = math.round(
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6)
    val relM = cands.map(c => c._2 -> m4(c._3)).toMap
    val emb = cands.map(c => c._2 -> c._4).toMap
    var selected = Vector.empty[Long]
    while (selected.size < 5) {
      val best = cands.map(_._2).filterNot(selected.contains).map { id =>
        val pen =
          if (selected.isEmpty) 0L
          else 500000L * selected.map(s => m4(cos(emb(id), emb(s)))).max
        (500000L * relM(id) - pen, id)
      }.minBy { case (s, id) => (-s, id) }._2
      selected :+= best
    }
    mmrOf(cands, k = 5, lambda = lam).map(_._3).toSeq shouldBe selected
  }

  test("MMR rewards anti-correlated candidates (no clamp at zero sim)") {
    val cands = Seq(
      (1L, 1L, 0.95, Seq(1.0, 0.0)),
      (1L, 2L, 0.50, Seq(-1.0, 0.0)), // anti-correlated to pick 1
      (1L, 3L, 0.90, Seq(0.0, 1.0)))  // orthogonal (sim 0)
    // score_2 = .5*.5 - .5*(-1) = 0.75 > score_3 = .45 - 0 = 0.45:
    // a zero-clamped penalty would flip this to 3
    mmrOf(cands, k = 2, lambda = 0.5) shouldBe Array(
      (1L, 1L, 1L), (1L, 2L, 2L))
  }

  test("MMR at lambda=0 still seeds with the most relevant item") {
    val cands = Seq(
      (1L, 5L, 0.3, Seq(1.0, 0.0)),
      (1L, 9L, 0.9, Seq(0.0, 1.0))) // higher rel, higher id
    mmrOf(cands, k = 1, lambda = 0.0) shouldBe Array((1L, 1L, 9L))
  }

  test("MMR fails loud on ragged dimensions and null embeddings") {
    val ragged = Seq(
      (1L, 1L, 0.9, Seq(1.0, 0.0)),
      (1L, 2L, 0.8, Seq(0.0, 1.0, 0.5)))
    val e1 = intercept[Exception] { mmrOf(ragged, k = 2, lambda = 0.5) }
    e1.getMessage should include("dimension mismatch")
    import spark.implicits._
    val withNull = Seq((1L, 1L, 0.9, Seq(1.0)), (1L, 2L, 0.8, null: Seq[Double]))
      .toDF("query_id", "vec_id", "rel", "emb")
    val e2 = intercept[Exception] {
      Similarity.mmrSelect(withNull, "vec_id", "rel", "emb", 2, 0.5).collect()
    }
    e2.getMessage should include("null id/rel/emb")
  }

  test("rankingRecall dedups BOTH sides: duplicate rows cannot skew it") {
    val ref = ranking((1L, 1L, 10L), (1L, 2L, 11L))
    val refDup = ranking((1L, 1L, 10L), (1L, 2L, 11L), (1L, 9L, 10L))
    val cand = ranking((1L, 1L, 10L))
    val clean = RankFusion.rankingRecall(cand, ref, "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dup = RankFusion.rankingRecall(cand, refDup, "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    dup shouldBe clean
    clean shouldBe Array((2L, 1L, 0.5))
  }

  test("fuzz: MMR selections are valid permutations of candidates for " +
      "random inputs across lambdas") {
    val rnd = new scala.util.Random(99)
    for (trial <- 0 until 4; lambda <- Seq(0.0, 0.3, 1.0)) {
      val m = 3 + rnd.nextInt(8)
      val cands = (0 until m).map { i =>
        (trial.toLong, i.toLong, rnd.nextDouble() * 2 - 1,
          Seq.fill(3)(rnd.nextDouble() * 2 - 1))
      }
      val out = mmrOf(cands, k = 5, lambda)
      val picked = out.map(_._3)
      picked.distinct.length shouldBe picked.length // no repeats
      picked.toSet.subsetOf(cands.map(_._2).toSet) shouldBe true
      out.map(_._2).toSeq shouldBe (1L to math.min(5, m).toLong) // dense ranks
    }
  }

  test("degenerate fusion inputs fail loud") {
    intercept[IllegalArgumentException] { RankFusion.rrf(Nil, "doc_id", 1) }
    intercept[IllegalArgumentException] {
      RankFusion.rrf(Seq(ranking((1L, 1L, 1L))), "doc_id", 0)
    }
  }
}
