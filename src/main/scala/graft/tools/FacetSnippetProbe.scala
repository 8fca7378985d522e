package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.{LexicalIndex, RankFusion, TextAnalysis}

/** Scale probe for the round-14 aggregation-over-retrieval operators
  * (SURVEY §9 evidence, the ProximityPassageProbe discipline): a FIXED
  * query set against one positional index per corpus multiple (sf0.1
  * documents duplicated 1x/2x/5x/10x, ids offset).
  *
  * Expected shapes: facet counts and snippets GROW LINEARLY in their
  * matched sets (facets aggregate every matching doc — m times more
  * duplicates means m times more matched rows; snippets join the fixed
  * queries x k ranked frame back onto an m-times-larger corpus scan),
  * so the probe checks per-matched-row throughput stays flat, while
  * the nDCG/MRR metric tails run on queries x k + judged frames whose
  * sizes the ranker caps — the metric overhead above the underlying
  * ranking must stay flat in m. Super-linear growth in any column
  * means a broadcast or pruning regression, the 100 TB failure mode.
  */
object FacetSnippetProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-facet-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("lang")).cache()
    val baseRows = docs.count()
    val queries = Seq(1L -> "fast table", 2L -> "value part",
        3L -> "key agg row", 4L -> "table")
      .toDF("query_id", "qterms")

    Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"), col("lang"))).reduce(_ unionAll _)
      val dir = graft.io.Spill.tempDir("graft-facet-probe-") + "/idx"
      LexicalIndex.write(corpus, "doc_id", "text", dir, nBuckets = 64,
        positional = true)
      val tf0 = System.nanoTime()
      val facetRows = LexicalIndex.facetCountsIndexed(spark, dir, queries,
        "query_id", "qterms", corpus, "doc_id", "lang").collect()
      val facetSecs = (System.nanoTime() - tf0) / 1e9
      val nMatched = facetRows.map(_.getLong(2)).sum
      val ts0 = System.nanoTime()
      val nSnip = LexicalIndex.passageSnippetsIndexed(spark, dir, corpus,
        "doc_id", "text", queries, "query_id", "qterms",
        window = 8, k = 20).count()
      val snipSecs = (System.nanoTime() - ts0) / 1e9
      // metric tail over the indexed BM25 ranking + overlap judgments
      val tm0 = System.nanoTime()
      val ranked = LexicalIndex.bm25TopKIndexed(spark, dir,
        queries.select(col("query_id"),
          graft.functions.TextFunctions.words(col("qterms")).as("qterms")),
        "query_id", "qterms", k = 10)
      val qt = queries.select(col("query_id"),
        explode(array_distinct(graft.functions.TextFunctions
          .words(col("qterms")))).as("term"))
      val judgments = corpus.select(col("doc_id"),
          explode(array_distinct(graft.functions.TextFunctions
            .words(col("text")))).as("term"))
        .join(broadcast(qt), Seq("term"))
        .groupBy(col("query_id"), col("doc_id"))
        .agg(count(lit(1)).as("grade"))
      val nNdcg = RankFusion.ndcgAtK(ranked, judgments, "doc_id", k = 10)
        .count()
      val ndcgSecs = (System.nanoTime() - tm0) / 1e9
      // significant terms: the fg join is the one corpus-scale doc-id
      // equi-join of the round-14 family — its growth must track the
      // matched set linearly, never super-linearly
      val tg0 = System.nanoTime()
      val nSig = LexicalIndex.significantTermsIndexed(spark, dir, queries,
        "query_id", "qterms", k = 10).count()
      val sigSecs = (System.nanoTime() - tg0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d " +
        f"facets=$facetSecs%.2f (matched=$nMatched%d) " +
        f"snippets=$snipSecs%.2f (rows=$nSnip%d) " +
        f"ndcg=$ndcgSecs%.2f (queries=$nNdcg%d) " +
        f"sig=$sigSecs%.2f (rows=$nSig%d)")
    }
    spark.stop()
  }
}
