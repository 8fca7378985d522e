package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Deterministic hash sampling/splitting: membership must be a pure
  * function of the id — stable across runs, partitioning, and cluster
  * shape — with uniform coverage.
  */
class SamplingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("sample membership is invariant under repartitioning and re-execution") {
    import spark.implicits._
    val base = Sampling.hashSample(ids(5000), "id", 0.3).as[Long].collect().toSet
    val repart = Sampling.hashSample(ids(5000).repartition(7), "id", 0.3)
      .as[Long].collect().toSet
    repart shouldBe base
    Sampling.hashSample(ids(5000), "id", 0.3).as[Long].collect().toSet shouldBe base
  }

  test("sample size tracks the fraction (uniform hash)") {
    val n = Sampling.hashSample(ids(10000), "id", 0.25).count()
    n.toDouble should be(2500.0 +- 200.0)
  }

  test("split labels partition the input totally and track fractions") {
    val out = Sampling.hashSplit(ids(10000), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.values.sum shouldBe 10000L
    counts("train").toDouble should be(8000.0 +- 300.0)
    counts("val").toDouble should be(1000.0 +- 150.0)
    counts("test").toDouble should be(1000.0 +- 150.0)
  }

  test("nested sampling: a smaller fraction is a subset of a larger one") {
    import spark.implicits._
    // u < 0.1 implies u < 0.3 — hash sampling supports monotone refinement
    val small = Sampling.hashSample(ids(5000), "id", 0.1).as[Long].collect().toSet
    val big = Sampling.hashSample(ids(5000), "id", 0.3).as[Long].collect().toSet
    small.subsetOf(big) shouldBe true
  }

  test("distinct salts draw near-independent samples") {
    import spark.implicits._
    val a = Sampling.hashSample(ids(10000), "id", 0.3, salt = "a").as[Long].collect().toSet
    val b = Sampling.hashSample(ids(10000), "id", 0.3, salt = "b").as[Long].collect().toSet
    val overlap = (a intersect b).size.toDouble
    // independent 0.3-samples overlap ~0.09 of the universe
    overlap should be(900.0 +- 300.0)
  }

  test("single-split degenerate case labels everything") {
    Sampling.hashSplit(ids(100), "id", Seq("all" -> 1.0))
      .where(col("split") === "all").count() shouldBe 100L
  }

  test("null ids drop from splits (not silently assigned to the last label)") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None, Some(4L)).toDF("id")
    val out = Sampling.hashSplit(df, "id", Seq("train" -> 0.5, "test" -> 0.5))
    out.count() shouldBe 3L
    out.where(col("id").isNull).count() shouldBe 0L
  }

  test("stratified sampling applies per-stratum fractions; default drops") {
    import spark.implicits._
    val df = (0L until 9000L).map(i => (i, s"s${i % 3}")).toDF("id", "g")
    val out = Sampling.stratifiedHashSample(df, "id", "g",
      Map("s0" -> 1.0, "s1" -> 0.25)) // s2 -> default 0.0
    val counts = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts("s0") shouldBe 3000L
    counts("s1").toDouble should be(750.0 +- 150.0)
    counts.get("s2") shouldBe None
    // stratified membership == plain hashSample within each stratum
    val plain = Sampling.hashSample(df.where(col("g") === "s1"), "id", 0.25)
      .select("id").as[Long].collect().toSet
    out.where(col("g") === "s1").select("id").as[Long].collect().toSet shouldBe plain
  }

  private def weightedDraw(weights: Seq[(Long, Long)], k: Int, salt: String,
      parts: Int = 3): Seq[Long] = {
    import spark.implicits._
    val df = weights.map { case (id, w) => (id, w, "g") }
      .toDF("id", "w", "grp").repartition(parts)
    Sampling.weightedTopK(df, "id", "w", "grp", k, salt)
      .orderBy(col("rank")).select("id").as[Long].collect().toSeq
  }

  test("weighted sample is deterministic and partitioning-invariant") {
    val ws = (0L until 200L).map(i => i -> (i % 7 + 1))
    val ref = weightedDraw(ws, k = 10, salt = "s", parts = 1)
    ref should have length 10
    (2 to 5).foreach(p => weightedDraw(ws, 10, "s", p) shouldBe ref)
  }

  test("inclusion tracks weight across salts (A-ES proportionality)") {
    // one heavy item (w=400) among 40 light ones (w=1): across many
    // independent draws the heavy item must appear nearly always, and
    // any FIXED light item only occasionally
    val ws = (1L to 40L).map(_ -> 1L) :+ (99L -> 400L)
    val draws = (1 to 30).map(s => weightedDraw(ws, k = 3, salt = s"$s"))
    draws.count(_.contains(99L)) should be >= 27
    draws.count(_.contains(7L)).toDouble should be <= 10.0
  }

  test("weighted sample: groups smaller than k, zero/negative weights drop") {
    val out = weightedDraw(Seq(1L -> 5L, 2L -> 0L, 3L -> -4L), k = 5, "x")
    out shouldBe Seq(1L) // only the positive-weight row is sampleable
  }

  test("shard assignment is deterministic, complete, and statistically balanced") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 800L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    def assign(d: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Sampling.shardAssign(d, "doc_id", nShards = 8, salt = "s")
        .select("doc_id", "shard").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a = assign(df)
    a.keySet shouldBe (1L to 800L).toSet // every row lands somewhere
    a.values.toSet shouldBe (0 until 8).toSet // every shard in range, used
    assign(df.repartition(5)) shouldBe a // partitioning-invariant
    // uniform hash: 100 expected per shard; 3-sigma ~ +-29
    val sizes = a.values.groupBy(identity).view.mapValues(_.size)
    sizes.values.foreach(n => n.toDouble shouldBe 100.0 +- 45.0)
  }

  test("deterministic shuffle is a reproducible permutation, salted per epoch") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    def order(d: org.apache.spark.sql.DataFrame, salt: String): Seq[Long] =
      Sampling.deterministicShuffle(d, "doc_id", salt)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val ep0 = order(df, "ep0")
    ep0.toSet shouldBe (1L to 200L).toSet // a permutation, nothing lost
    ep0 should not be (1L to 200L) // and actually shuffled
    order(df.repartition(7), "ep0") shouldBe ep0 // partitioning-invariant
    order(df, "ep1") should not be ep0 // a new epoch, a new permutation
    // sorted by the hash key, ascending
    val keys = Sampling.deterministicShuffle(df, "doc_id", "ep0")
      .select(col("shuffle_key")).collect().map(_.getDouble(0)).toSeq
    keys shouldBe keys.sorted
  }

  test("leakage-safe split: no near-dup pair straddles train/val, " +
      "singletons split per-doc, deterministic under repartitioning") {
    import spark.implicits._
    // pair graph: {1,2,3} chained, {10,11} — 4,5,6 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L).toDF("doc_id")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.leakageSafeSplit(d, "doc_id", pairs, 0.5, "s")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
    val out = run(docs)
    out.keySet shouldBe docs.collect().map(_.getLong(0)).toSet // total
    // every cluster member carries the min-id representative AND one side
    Seq(1L, 2L, 3L).map(out(_)._1).toSet shouldBe Set(1L)
    Seq(1L, 2L, 3L).map(out(_)._2).toSet should have size 1
    Seq(10L, 11L).map(out(_)._1).toSet shouldBe Set(10L)
    Seq(10L, 11L).map(out(_)._2).toSet should have size 1
    // singletons are their own representative
    Seq(4L, 5L, 6L).foreach(i => out(i)._1 shouldBe i)
    out.values.map(_._2).toSet should contain allOf ("train", "val")
    run(docs.repartition(5)) shouldBe out // partitioning-invariant
    // the decisive property at corpus size: NO pair straddles the split —
    // and the per-doc hash split it replaces demonstrably does
    val big = (1L to 400L).toDF("doc_id")
    val bigPairs = (1L to 199L).map(i => (2 * i, 2 * i + 1))
      .toDF("id_a", "id_b") // 199 adjacent-odd/even pairs
    val safe = Sampling.leakageSafeSplit(big, "doc_id", bigPairs, 0.3, "z")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    bigPairs.collect().foreach { r =>
      safe(r.getLong(0)) shouldBe safe(r.getLong(1))
    }
    val naive = Sampling.hashSplit(big, "doc_id",
      Seq("train" -> 0.7, "val" -> 0.3))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    bigPairs.collect().count(r =>
      naive(r.getLong(0)) != naive(r.getLong(1))) should be > 0
  }

  test("leakage-safe split size-gates the label broadcast: past the row " +
      "cap it degrades to a shuffle join with identical output") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 10L, 11L).toDF("doc_id")
    def collectOf(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    val hinted = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 0.5, "s")
    val gated = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 0.5, "s",
      maxLabelBroadcastRows = 0L) // force the too-large-to-broadcast path
    collectOf(gated) shouldBe collectOf(hinted) // membership unchanged
    // the fallback really is a plain join: no broadcast HINT survives in
    // the optimized plan (AQE may still choose broadcast at these sizes —
    // the hint's absence is what unpins the forced driver-side broadcast)
    (gated.queryExecution.optimizedPlan.toString
      should not include "ResolvedHint")
    val spark2 = docs.sparkSession
    val prevThreshold = spark2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark2.conf.get("spark.sql.adaptive.enabled")
    try {
      spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark2.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 0.5, "s",
        maxLabelBroadcastRows = 0L).queryExecution.executedPlan.toString
      plan should not include "BroadcastHashJoin" // genuinely un-forced
      // while the hinted path still broadcasts even with auto-broadcast off
      val hintedPlan = Sampling.leakageSafeSplit(docs, "doc_id", pairs, 0.5,
        "s").queryExecution.executedPlan.toString
      hintedPlan should include("BroadcastHashJoin")
    } finally {
      spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark2.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
