package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** DSIR importance resampling: weights are checked against an independent
  * from-the-definition reimplementation (raw md5 bucket fold + smoothed
  * count arithmetic in plain Scala), selection is checked on a separable
  * corpus (target-vocab docs must dominate the draw), feature-free docs
  * keep weight 1, and the pipeline is deterministic under repartitioning.
  */
class DsirSpec extends AnyFunSuite with Matchers with SparkSpec {
  import spark.implicits._

  private val B = 16

  /** Independent unitHash twin: first 8 md5 hex chars as u32 / 2^32. */
  private def unit(s: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"${b & 0xFF}%02x").mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def feats(text: String): Seq[String] = {
    val ws = text.toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq
    ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
  }

  private def bucket(feat: String, salt: String): Int =
    math.floor(unit(feat + salt) * B).toInt

  test("weights match the from-the-definition arithmetic") {
    val target = Seq((100L, "the quick brown fox"), (101L, "the lazy dog"))
    val raw = Seq((1L, "the quick dog"), (2L, "zyx wvu tsr"), (3L, ""))
    val salt = "s1"

    val tb = target.flatMap(d => feats(d._2)).map(bucket(_, salt))
      .groupBy(identity).view.mapValues(_.size).toMap
    val rb = raw.flatMap(d => feats(d._2)).map(bucket(_, salt))
      .groupBy(identity).view.mapValues(_.size).toMap
    val (nt, nr) = (tb.values.sum, rb.values.sum)
    // micro-nat ratios (round half away from zero), exact long sums —
    // the operator's cross-engine determinism contract
    def logrMicros(b: Int): Long =
      BigDecimal((math.log((tb.getOrElse(b, 0) + 1.0) / (nt + B)) -
        math.log((rb.getOrElse(b, 0) + 1.0) / (nr + B))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = raw.map { case (id, text) =>
      val fs = feats(text)
      id -> ((fs.size.toLong,
        fs.map(f => logrMicros(bucket(f, salt))).sum / 1e6))
    }.toMap

    val got = Dsir.importanceWeights(raw.toDF("doc_id", "text"),
        target.toDF("doc_id", "text"), "doc_id", "text", B, salt)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, (n, w)) =>
      got(id)._1 shouldBe n
      got(id)._2 shouldBe w +- 1e-9
    }
    // the feature-free doc keeps the paper's weight 1 (logw 0), n_feats 0
    got(3L) shouldBe ((0L, 0.0))
  }

  test("selection on a separable corpus draws the target-like half") {
    // target vocabulary and raw type-A docs share words; type-B docs use
    // a disjoint vocabulary — per-doc log-ratio gaps are tens of nats, so
    // Gumbel noise (scale 1) cannot promote B over A
    val aWords = Seq("data", "model", "train", "token", "scale")
    val bWords = Seq("qqq", "zzz", "xxx", "jjj", "kkk")
    def doc(ws: Seq[String], seed: Int): String =
      (0 until 20).map(i => ws((i * 7 + seed) % ws.size)).mkString(" ")
    val target = (0 until 5).map(i => (1000L + i, doc(aWords, i))).toDF("doc_id", "text")
    val raw = ((0 until 30).map(i => (i.toLong * 2, doc(aWords, i))) ++
      (0 until 30).map(i => (i.toLong * 2 + 1, doc(bWords, i)))).toDF("doc_id", "text")

    val picked = Dsir.resample(raw, target, "doc_id", "text",
        buckets = 64, k = 30, salt = "sep", sampleSalt = "g")
      .select(col("doc_id")).as[Long].collect()
    picked should have length 30
    // type-A docs have even ids
    picked.count(_ % 2 == 0) shouldBe 30
    // ranks are 1..k in key order
    val ranks = Dsir.resample(raw, target, "doc_id", "text",
        buckets = 64, k = 30, salt = "sep", sampleSalt = "g")
      .select(col("rank")).as[Int].collect()
    ranks.toSeq shouldBe (1 to 30)
  }

  test("weights and selection are invariant under repartitioning") {
    val docs = (0L until 80L).map(i =>
      (i, s"w${i % 11} w${(i * 3) % 11} w${(i * 5) % 11} common words here"))
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = {
      val raw = df.where(col("doc_id") % 4 =!= 0)
      val tgt = df.where(col("doc_id") % 4 === 0)
      Dsir.resample(raw, tgt, "doc_id", "text", buckets = 32, k = 15,
          salt = "inv", sampleSalt = "u")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(3))).toSeq
    }
    run(docs.repartition(13)) shouldBe run(docs.coalesce(1))
  }
}
