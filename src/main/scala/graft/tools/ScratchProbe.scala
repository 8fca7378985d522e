package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.functions.TextFunctions

/** Throwaway micro-bench for expression-level attribution while
  * optimizing (dev-only; measures steps of the hot tokenize/score paths
  * with the noop sink). Steps evolve with the investigation — numbers are
  * recorded in OPTIMIZATION_r20.md, not here.
  */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-scratch")
    spark.sparkContext.setLogLevel("ERROR")

    // run each step TWICE: first reading pays JIT, second is the warm
    // number optimization decisions are made on
    def time(name: String)(df: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"${ts(0)}%7.2f s -> ${ts(1)}%7.2f s  $name")
    }

    def timeQ(name: String): Unit = time(name)(
      graft.SparkEntry.queries(name)(spark, sfDir))

    val docs0 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = docs0.repartition(32)

    time("warm scan")(docs0)

    // the exact q153 bm25TopK internals, piecewise
    val queries = docs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("query_id"),
        slice(TextFunctions.words(col("text")), 1, 8).as("qterms"))
    time("queries frame")(queries)
    val qtermsD = queries
      .select(explode(array_distinct(col("qterms"))).as("term")).distinct()
    time("qterms distinct")(qtermsD)
    def tfProj = docs
      .select(col("doc_id"),
        TextFunctions.words(col("text")).as("__w"))
      .select(col("doc_id"), size(col("__w")).cast("long").as("doc_len"),
        explode(call_function("token_counts", col("__w"))).as("__tc"))
      .select(col("doc_id"), col("doc_len"),
        col("__tc.token").as("term"), col("__tc.n").as("tf"))
    time("tfProjection noop")(tfProj)
    time("tfProjection + semi join noop")(
      tfProj.join(broadcast(qtermsD), Seq("term"), "left_semi"))
    time("SPILL tf (write+read)")(
      graft.io.Spill(tfProj.join(broadcast(qtermsD), Seq("term"),
        "left_semi"), "graft-scratch-"))
    // rank-tail bisect: df rollup, scored projection, qterms fan-out,
    // (q,doc) micro-sum, topk — over a pre-spilled tf
    val tf = graft.io.Spill(tfProj.join(broadcast(qtermsD), Seq("term"),
      "left_semi"), "graft-scratch-")
    val qterms = queries
      .select(col("query_id"), explode(array_distinct(col("qterms")))
        .as("term")).distinct()
    val stats = docs
      .select(TextFunctions.sizeOrNull(TextFunctions.words(col("text")))
        .cast("double").as("l"))
      .agg(count(lit(1)).cast("double").as("n"), avg(col("l")).as("avgdl"))
    val dfr = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    time("df rollup")(dfr)
    val k1 = 1.2; val b = 0.75
    def scored = tf
      .join(broadcast(dfr), Seq("term"))
      .join(broadcast(stats))
      .select(col("term"), col("doc_id"),
        round(round(
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
            * (col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1)
              * (lit(1 - b) + lit(b) * col("doc_len") / col("avgdl"))),
          6) * 1e6).cast("long").as("__sm"))
    time("scored (116k rows)")(scored)
    def fanned = scored.join(broadcast(qterms), Seq("term"))
    time("fanout join (2.7M rows)")(fanned)
    def summed = fanned.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__sm")).as("__m"))
      .select(col("query_id"), col("doc_id"),
        col("__m").cast("double").as("sim"))
    time("fanout + (q,doc) sum (498k)")(summed)
    val topk = udaf(new graft.functions.TopKAggregator(10))
    time("full rank tail")(summed.groupBy(col("query_id"))
      .agg(topk(col("sim"), col("doc_id")).as("ids"))
      .select(col("query_id"), posexplode(col("ids"))
        .as(Seq("rank", "doc_id"))))
    // export-chain pieces: the q193 subset pair graph + CC split
    val subset = Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") % 5 === 0)
    def pairs = graft.operators.Dedup.ngramJaccardPairs(subset, "doc_id",
      "text", n = 3, threshold = 0.02)
    time("ngramJaccardPairs (q193 subset)")(pairs)
    val t0cc = System.nanoTime()
    val cc = graft.operators.Dedup.connectedComponents(pairs)
    println(f"${(System.nanoTime() - t0cc) / 1e9}%7.2f s  connectedComponents (eager)")
    val t1cc = System.nanoTime()
    val cnt = cc.count()
    println(f"${(System.nanoTime() - t1cc) / 1e9}%7.2f s  labels.count ($cnt)")
    timeQ("q193_leakage_split")
    pairs.explain("formatted")
    timeQ("q153_ndcg")
    timeQ("q134_bm25_topk")

    spark.stop()
  }
}
