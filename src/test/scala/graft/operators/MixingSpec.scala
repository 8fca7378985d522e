package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Corpus mixing: under-budget sources pass whole, over-budget sources
  * thin to ~budget token mass, membership is deterministic and NESTED
  * under budget increases (re-cutting a mix never drops a kept doc).
  */
class MixingSpec extends AnyFunSuite with Matchers with SparkSpec {

  // two sources: "small" (100 docs x 10 tokens), "big" (1000 x 10)
  private def corpus = {
    import spark.implicits._
    ((0L until 100L).map(i => (i, "small", 10L)) ++
      (1000L until 2000L).map(i => (i, "big", 10L)))
      .toDF("doc_id", "source", "tokens")
  }

  test("under-budget sources pass through whole") {
    val out = Mixing.mixToTokenBudget(corpus, "doc_id", "source", "tokens",
      budgets = Map("small" -> 10_000L), defaultBudget = 10_000L)
    out.where(col("source") === "small").count() shouldBe 100L
    out.where(col("source") === "big").count() shouldBe 1000L
  }

  test("over-budget sources thin to ~budget token mass") {
    val out = Mixing.mixToTokenBudget(corpus, "doc_id", "source", "tokens",
      budgets = Map.empty, defaultBudget = 2500L)
    // small (1000 tokens) is under budget: whole
    out.where(col("source") === "small").count() shouldBe 100L
    // big (10000 tokens): expect ~250 docs (2500 tokens / 10 per doc)
    val kept = out.where(col("source") === "big").count()
    kept.toDouble shouldBe 250.0 +- 60.0
  }

  test("membership is deterministic and nested under budget increases") {
    def mix(budget: Long) = Mixing.mixToTokenBudget(corpus, "doc_id",
      "source", "tokens", Map.empty, budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val at2k = mix(2000L)
    mix(2000L) shouldBe at2k // re-run identical
    val at5k = mix(5000L)
    at2k.subsetOf(at5k) shouldBe true // raising a budget only adds docs
  }

  test("zero budget drops over-budget sources entirely") {
    val out = Mixing.mixToTokenBudget(corpus, "doc_id", "source", "tokens",
      Map("small" -> 10_000L), defaultBudget = 0L)
    out.where(col("source") === "big").count() shouldBe 0L
    out.where(col("source") === "small").count() shouldBe 100L
  }

  test("distinct salts cut independent mixes") {
    def mix(salt: String) = Mixing.mixToTokenBudget(corpus, "doc_id",
      "source", "tokens", Map.empty, 5000L, salt = salt)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = mix("a"); val b = mix("b")
    a should not be b
  }

  test("temperature alpha=1 with budget = total keeps everything exactly once") {
    val out = Mixing.mixByTemperature(corpus, "doc_id", "source", "tokens",
      alpha = 1.0, totalBudget = 11_000L) // total mass = 1100 docs x 10
    out.count() shouldBe 1100L
    out.agg(max(col("mix_copy"))).collect()(0).getInt(0) shouldBe 1
  }

  test("temperature alpha<1 up-weights the small source with repetition") {
    // alpha=0.5: pw_small/pw_big = sqrt(1000/10000) ~ 0.316 vs proportional
    // 0.1 — the small source's kept-token share must EXCEED its natural
    // share, and with a large budget its rate exceeds 1 so copies appear
    val out = Mixing.mixByTemperature(corpus, "doc_id", "source", "tokens",
      alpha = 0.5, totalBudget = 11_000L)
    val bySource = out.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), max(col("mix_copy")).as("maxc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getInt(2))).toMap
    // rate_small = 11000 * (sqrt(1000)/(sqrt(1000)+sqrt(10000))) / 1000 ~ 2.64
    bySource("small")._2 should be >= 2 // repeated copies present
    val smallShare = bySource("small")._1.toDouble / out.count()
    smallShare should be > (100.0 / 1100.0) // above natural share
  }

  test("temperature membership is partitioning-invariant and deterministic") {
    def cut(df: org.apache.spark.sql.DataFrame) =
      Mixing.mixByTemperature(df, "doc_id", "source", "tokens",
        alpha = 0.7, totalBudget = 6000L, salt = "s")
        .select("doc_id", "mix_copy").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
    val once = cut(corpus)
    cut(corpus.repartition(13)) shouldBe once
    once should not be empty
  }

  test("temperature drops a zero-token-mass source instead of inflating it") {
    import spark.implicits._
    val withEmpty = corpus.unionByName(
      (5000L until 5050L).map(i => (i, "empty", 0L))
        .toDF("doc_id", "source", "tokens"))
    val out = Mixing.mixByTemperature(withEmpty, "doc_id", "source",
      "tokens", alpha = 0.5, totalBudget = 11_000L)
    out.where(col("source") === "empty").count() shouldBe 0L
    out.count() should be > 0L // the real sources still mix
  }

  test("temperature maxRate caps repetition") {
    val out = Mixing.mixByTemperature(corpus, "doc_id", "source", "tokens",
      alpha = 0.1, totalBudget = 1_000_000L, maxRate = 3.0)
    out.agg(max(col("mix_copy"))).collect()(0).getInt(0) should be <= 3
  }

  // 300 scored docs, bits 1.0 .. 300.0 -> tercile cuts at 100.5 / 200.5,
  // buckets of exactly 100 docs x 10 tokens (1000 tokens each)
  private def scored = {
    import spark.implicits._
    (1L to 300L).map(i => (i, i.toDouble, 10L))
      .toDF("doc_id", "bits", "tokens")
  }

  test("perplexity buckets cut at exact quantiles with per-bucket budgets") {
    val out = Mixing.mixByPerplexityBuckets(scored, "doc_id", "bits",
      "tokens", budgets = Seq(100000L, 300L, 0L), salt = "p")
    val byBucket = out.groupBy("ppl_bucket")
      .agg(count(lit(1)).as("n"), min("bits").as("lo"), max("bits").as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    // head: budget >> mass -> pass-through, all 100 docs, bits 1..100
    byBucket(0)._1 shouldBe 100L
    byBucket(0)._2 shouldBe 1.0
    byBucket(0)._3 shouldBe 100.0
    // middle: 300/1000 of the mass, and only middle-tercile bits
    byBucket(1)._1 should (be > 10L and be < 60L)
    byBucket(1)._2 should be > 100.5
    byBucket(1)._3 should be < 200.5
    // tail: zero budget -> dropped entirely
    byBucket.contains(2) shouldBe false
  }

  test("perplexity-bucket membership is nested and partitioning-invariant") {
    def ids(df: org.apache.spark.sql.DataFrame, budgets: Seq[Long]) =
      Mixing.mixByPerplexityBuckets(df, "doc_id", "bits", "tokens",
        budgets, salt = "p")
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(scored, Seq(200L, 200L, 200L))
    val large = ids(scored, Seq(500L, 500L, 500L))
    small.subsetOf(large) shouldBe true // per-bucket nestedness
    ids(scored.repartition(13), Seq(200L, 200L, 200L)) shouldBe small
  }
}
