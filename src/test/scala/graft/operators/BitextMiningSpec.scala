package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Margin-based bitext mining ([[Similarity.marginMinePairs]], the
  * CCMatrix ratio criterion): the margin must demote hub vectors that
  * raw nearest-cosine mining would pair with everything, the scores
  * must match a from-the-definition replication through the exact
  * 4-decimal/micros discipline, and the forward-best/threshold
  * semantics must hold.
  */
class BitextMiningSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def frame(rows: (Long, Seq[Double])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  /** From-the-definition margin replication with the operator's exact
    * rounding sequence (cos→4dp→1e4 longs; integer sums; one double
    * division chain; 6dp round).
    */
  private def replicate(src: Map[Long, Seq[Double]],
      tgt: Map[Long, Seq[Double]], k: Int,
      minMargin: Double): Map[Long, (Long, Double)] = {
    def cos(a: Seq[Double], b: Seq[Double]): Long = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      Math.round(BigDecimal(d / n)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * 1e4)
    }
    def topk(sims: Seq[(Long, Long)]): Seq[(Long, Long)] = // (id, c) -> (c, id)
      sims.map(_.swap).sortBy(p => (-p._1, p._2)).take(k)
    val fwd = src.map { case (x, xv) =>
      x -> topk(tgt.toSeq.map { case (y, yv) => (y, cos(xv, yv)) }) }
    val bwd = tgt.map { case (y, yv) =>
      y -> topk(src.toSeq.map { case (x, xv) => (x, cos(yv, xv)) }) }
    src.flatMap { case (x, _) =>
      val nn = fwd(x)
      val sx = nn.map(_._1).sum
      val cands = nn.flatMap { case (c, y) =>
        val sy = bwd(y).map(_._1).sum
        val denom = sx.toDouble / nn.size + sy.toDouble / bwd(y).size
        if (denom <= 0) None
        else {
          val m = BigDecimal(c.toDouble * 2 / denom)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (m >= minMargin) Some((y, m)) else None
        }
      }
      if (cands.isEmpty) None
      else Some(x -> cands.maxBy(p => (p._2, -p._1)))
    }
  }

  test("a hub target close to every source loses to the mutual pair " +
      "even though raw cosine ranks the hub first") {
    // x1's raw nearest is the hub (0.7171 > 0.7) but the hub's high
    // backward neighborhood demotes it; y1's anti-correlation with x2
    // collapses its neighborhood average and boosts the true pair
    val src = frame(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0))
    val tgt = frame(
      10L -> Seq(0.7171, 0.6970), // hub: close to BOTH sources
      11L -> Seq(0.7, -0.7141))   // mutual partner of x1 only
    val out = Similarity.marginMinePairs(src, tgt, "vec_id", "embedding",
        k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    out(1L)._1 shouldBe 11L // margin flips the raw-cosine choice
    out(1L)._2 should be > 1.5
    out(2L)._1 shouldBe 10L // x2's only positive-margin candidate
    val want = replicate(
      Map(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)),
      Map(10L -> Seq(0.7171, 0.6970), 11L -> Seq(0.7, -0.7141)),
      k = 2, minMargin = 0.0)
    out shouldBe want
  }

  test("scores match a from-the-definition replication on a larger " +
      "deterministic fixture, one forward-best pair per src") {
    val srcRows = (0L until 8L).map(i =>
      i -> Seq(math.cos(i * 0.7), math.sin(i * 0.7)))
    val tgtRows = (100L until 110L).map(j =>
      j -> Seq(math.cos(j * 0.37 + 0.1), math.sin(j * 0.37 + 0.1)))
    val out = Similarity.marginMinePairs(frame(srcRows: _*),
        frame(tgtRows: _*), "vec_id", "embedding", k = 3,
        minMargin = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    out.map(_._1).distinct.length shouldBe out.length // one pair per src
    out.toMap shouldBe replicate(srcRows.toMap, tgtRows.toMap,
      k = 3, minMargin = 1.0)
    // the threshold actually gates: a high bar empties the result
    Similarity.marginMinePairs(frame(srcRows: _*), frame(tgtRows: _*),
      "vec_id", "embedding", k = 3, minMargin = 99.0).count() shouldBe 0L
  }

  test("the LSH-bucketed miner equals the exact sweep when the " +
      "bucketing recalls every cross pair (shared margin tail), and " +
      "stays one-pair-per-src under partial recall") {
    // tight cluster: every vector points near e1 with small noise, so
    // all vectors share each table's sign pattern and every cross pair
    // collides — candidates == full sweep, outputs must be IDENTICAL
    def tight(i: Long): Seq[Double] =
      Seq(1.0) ++ (1 until 8).map(j => ((i * 7 + j * 13) % 11 - 5) / 100.0)
    val src = frame((0L until 10L).map(i => i -> tight(i)): _*)
    val tgt = frame((100L until 112L).map(i => i -> tight(i)): _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    rows(Similarity.marginMinePairsLsh(src, tgt, "vec_id", "embedding",
      k = 3, nPlanes = 4, nTables = 12)) shouldBe
      rows(Similarity.marginMinePairs(src, tgt, "vec_id", "embedding",
        k = 3))
    // spread fixture at ONE stingy table: collisions are partial, the
    // miner still returns at most one forward-best pair per src and
    // only pairs that actually collided (a subset of the exact sweep's
    // candidate universe)
    val spreadS = frame((0L until 12L).map(i =>
      i -> (0 until 8).map(j => math.cos(i * 0.9 + j * 0.61))): _*)
    val spreadT = frame((100L until 116L).map(i =>
      i -> (0 until 8).map(j => math.sin(i * 0.53 + j * 0.37))): _*)
    val lsh = rows(Similarity.marginMinePairsLsh(spreadS, spreadT,
      "vec_id", "embedding", k = 3, nPlanes = 4, nTables = 1))
    lsh.map(_._1).distinct.length shouldBe lsh.length
    lsh.length should be < 12 // the single stingy table lost candidates
  }

  test("miningErrorRate: correct on any gold target, missing counts " +
      "as error, unjudged mined pairs ignored, duplicates collapse") {
    import spark.implicits._
    val gold = Seq((1L, 11L), (2L, 10L), (3L, 99L), (4L, 40L), (4L, 41L))
      .toDF("src_id", "tgt_id") // src 4 has TWO acceptable targets
    val mined = Seq((1L, 11L), (2L, 12L), (4L, 41L), (5L, 77L),
        (1L, 11L)) // duplicate mined row; src 5 unjudged; src 3 missing
      .toDF("src_id", "tgt_id")
    val out = Similarity.miningErrorRate(mined, gold).head()
    out.getLong(0) shouldBe 4L // gold sources
    out.getLong(1) shouldBe 2L // 1 and 4 correct (4 via its 2nd gold)
    out.getLong(2) shouldBe 1L // 3 missing
    out.getDouble(3) shouldBe 0.5 // 1 - 2/4
    // an empty gold frame yields no rows, not one null-filled row
    import spark.implicits._
    Similarity.miningErrorRate(mined,
      Seq.empty[(Long, Long)].toDF("src_id", "tgt_id")).count() shouldBe 0L
  }

  test("mining against the persisted LSH index equals the one-shot " +
      "bucketed miner, appended target batches included") {
    def vec(i: Long): Seq[Double] =
      (0 until 8).map(j => math.cos(i * 0.83 + j * 0.47))
    val src = frame((0L until 10L).map(i => i -> vec(i)): _*)
    val tgtAll = (100L until 120L).map(i => i -> vec(i))
    val dir = graft.io.Spill.tempDir("graft-bitext-idx-") + "/lsh"
    // seed the index with half the target corpus, append the rest the
    // way the streaming maintainer lands postings (same projection)
    Similarity.writeLshIndex(frame(tgtAll.take(10): _*), "vec_id",
      "embedding", dir, nPlanes = 2, nTables = 6, dim = 8)
    Similarity.lshPostings(frame(tgtAll.drop(10): _*), "vec_id",
        "embedding", nPlanes = 2, nTables = 6, dim = 8)
      .write.mode("append").partitionBy("table", "bucket").parquet(dir)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    rows(Similarity.marginMinePairsIndexed(spark, dir, src, "vec_id",
      "embedding", k = 3, nPlanes = 2, nTables = 6)) shouldBe
      rows(Similarity.marginMinePairsLsh(src, frame(tgtAll: _*),
        "vec_id", "embedding", k = 3, nPlanes = 2, nTables = 6))
  }

  test("the persisted-index miner is gated under miningErrorRate like " +
      "the one-shot variant: zero error at full recall, and identical " +
      "error to one-shot LSH under partial recall") {
    def gate(mined: org.apache.spark.sql.DataFrame,
        gold: org.apache.spark.sql.DataFrame): Double =
      Similarity.miningErrorRate(mined.select("src_id", "tgt_id"),
        gold.select("src_id", "tgt_id")).head().getDouble(3)
    // tight cluster (every cross pair collides): the indexed miner's
    // pairs equal the exact sweep's, so its audited error rate is 0
    def tight(i: Long): Seq[Double] =
      Seq(1.0) ++ (1 until 8).map(j => ((i * 7 + j * 13) % 11 - 5) / 100.0)
    val src = frame((0L until 10L).map(i => i -> tight(i)): _*)
    val tgt = frame((100L until 112L).map(i => i -> tight(i)): _*)
    val gold = Similarity.marginMinePairs(src, tgt, "vec_id",
      "embedding", k = 3)
    val dir = graft.io.Spill.tempDir("graft-bitext-gate-") + "/lsh"
    Similarity.writeLshIndex(tgt, "vec_id", "embedding", dir,
      nPlanes = 4, nTables = 12, dim = 8)
    gate(Similarity.marginMinePairsIndexed(spark, dir, src, "vec_id",
      "embedding", k = 3, nPlanes = 4, nTables = 12), gold) shouldBe 0.0
    // spread fixture at ONE stingy table: recall is partial, so the
    // audit reads a REAL error — and the indexed path's audited rate
    // must equal the one-shot LSH path's (same candidates by
    // construction, so a divergence means the index dropped postings)
    val spreadS = frame((0L until 12L).map(i =>
      i -> (0 until 8).map(j => math.cos(i * 0.9 + j * 0.61))): _*)
    val spreadT = frame((100L until 116L).map(i =>
      i -> (0 until 8).map(j => math.sin(i * 0.53 + j * 0.37))): _*)
    val spreadGold = Similarity.marginMinePairs(spreadS, spreadT,
      "vec_id", "embedding", k = 3)
    val dir2 = graft.io.Spill.tempDir("graft-bitext-gate2-") + "/lsh"
    Similarity.writeLshIndex(spreadT, "vec_id", "embedding", dir2,
      nPlanes = 4, nTables = 1, dim = 8)
    val idxErr = gate(Similarity.marginMinePairsIndexed(spark, dir2,
      spreadS, "vec_id", "embedding", k = 3, nPlanes = 4, nTables = 1),
      spreadGold)
    val lshErr = gate(Similarity.marginMinePairsLsh(spreadS, spreadT,
      "vec_id", "embedding", k = 3, nPlanes = 4, nTables = 1),
      spreadGold)
    idxErr shouldBe lshErr
    idxErr should be > 0.0 // the stingy table really lost pairs
  }
}
