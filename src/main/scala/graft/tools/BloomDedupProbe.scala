package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Dedup

/** Scale probe for Bloom-routed cross-run exact dedup (SURVEY §9
  * evidence): the claim is that at 100 TB the common case — a mostly-
  * NOVEL incoming batch — should not pay a shuffle anti-join against
  * the whole fingerprint history, because the history folds into one
  * filter and filter-rejected rows take the map-only lane. The probe
  * grows the history m× (corpus copies under distinct-text ids) and
  * times one fixed batch (half novel, half repeats of history texts)
  * through BOTH paths, asserting identical novel counts. The bloom
  * path's history cost is the filter build (one digest-column
  * aggregate, linear in history rows, no shuffle wider than the
  * aggregate) plus a confirm join bounded by the batch's true-dup +
  * false-positive sliver — so its growth with m should track the
  * filter build, while the plain path re-shuffles the full batch
  * against the full history every time.
  */
object BloomDedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()
    // half repeats (history texts verbatim), half novel (salted texts
    // no history batch ever carried)
    val batch = docs.limit(250)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))
      .unionByName(docs.limit(250)
        .select((col("doc_id") + lit(910000000L)).as("doc_id"),
          concat(col("text"), lit(" probe-novel-salt"), col("doc_id"))
            .as("text")))
      .cache()
    batch.count()

    Seq(1, 10, 50, 200).foreach { m =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-bloom-probe").toString
      val plainT = base + "/plain"; val bloomT = base + "/bloom"
      // distinct TEXTS per copy (suffix-salted), so history fp count
      // actually grows m x rather than folding to one distinct set;
      // ONE m-fold batch per table keeps setup linear
      val history = spark.range(m).toDF("i").crossJoin(docs).select(
        (col("doc_id") + col("i") * lit(10_000_000L)).as("doc_id"),
        when(col("i") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" history-salt-"),
            col("i"))).as("text"))
      Dedup.incrementalExactDedup(history, "doc_id", "text", plainT, "h")
      Dedup.incrementalExactDedup(history, "doc_id", "text", bloomT, "h")
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      def probe(tag: Long) = batch.select(
        (col("doc_id") + lit(tag)).as("doc_id"),
        concat(col("text"), when(col("doc_id") >= 910000000L,
          lit(s" probe-$tag")).otherwise(lit(""))).as("text"))
      val (nPlain, sPlain) = time(Dedup.incrementalExactDedup(
        probe(0L), "doc_id", "text", plainT, "probe").count())
      // cold call builds + persists the filter (count + scan + save);
      // warm call is the steady state every later batch pays
      val (nCold, sCold) = time(Dedup.incrementalExactDedupBloom(
        probe(0L), "doc_id", "text", bloomT, "cold", fpp = 0.01).count())
      val (nWarm, sWarm) = time(Dedup.incrementalExactDedupBloom(
        probe(1_000_000L), "doc_id", "text", bloomT, "warm",
        fpp = 0.01).count())
      require(nPlain == nCold && nCold == nWarm,
        s"novel sets diverged: plain=$nPlain cold=$nCold warm=$nWarm")
      println(f"history=${m * baseRows}%d batch=500 novel=$nWarm%d " +
        f"plain=$sPlain%.2fs bloomCold=$sCold%.2fs bloomWarm=$sWarm%.2fs")
    }
    spark.stop()
  }
}
