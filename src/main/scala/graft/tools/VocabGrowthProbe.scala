package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.operators.{LexicalIndex, TextAnalysis}

/** Vocabulary-growth scale probe (SURVEY §9): every duplication-based
  * probe multiplies the CORPUS while holding the distinct-term count
  * constant, so it is blind to vocabulary-driven hazards — the round-14
  * significant-terms fold was exactly such a miss. This probe grows the
  * VOCABULARY (synthetic distinct tokens, 1e5 → 3e6) and measures the
  * three operators whose cost is a function of |vocab|:
  *
  *  - significantTerms: a broad query's candidate set IS the matched
  *    set's co-occurring vocabulary; the bounded TopKTermsAggregator
  *    must keep the fold linear in V with O(k) reducer buffers (the
  *    pre-fix collect_list shape would materialize all V in one row).
  *  - bm25TopKFuzzy at dist 2: SymSpell builds O(L²/2) deletion
  *    variants PER VOCAB TERM — the expansion table is the vocabulary
  *    blown up ~40x, and its join must stay linear in V.
  *  - tfidfKeywordsIndexed: the df rollup and per-doc rank run over
  *    V-proportional posting rows.
  *
  * Every doc carries 20 unique tokens plus a shared 'needle0..9' term
  * on 1 in 10 docs, so the query's match set (and the significant-terms
  * candidate vocabulary) grows linearly with V while each doc stays
  * constant-sized. Reported: seconds and ns per distinct vocab term —
  * the per-term rate must stay FLAT (linear total) across the sweep;
  * super-linear growth or an executor OOM is the 100 TB failure mode.
  */
object VocabGrowthProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local("graft-vocab-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // V distinct tokens as V/20 docs x 20 fresh tokens; doc texts are
    // deterministic pure functions of the id (no fixture read: the
    // probe's independent variable is vocabulary, nothing else)
    def corpus(v: Long) = {
      val docs = v / 20
      spark.range(0, docs, 1, 32).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 20).map(j =>
            format_string("tk%09d", col("id") * 20 + lit(j))) :+
          when(col("id") % 10 === 0,
            // id is a multiple of 10 here, so cycle the needle index
            // off id/10 — (id % 7) would only ever yield needle0..6
            // and the fuzzy probe's needle7..9 queries would never
            // match the corpus
            format_string("needle%d",
              (col("id") / 10).cast("long") % 10))
            .otherwise(lit("")): _*).as("text"))
    }

    Seq(100_000L, 300_000L, 1_000_000L, 3_000_000L).foreach { v =>
      val docs = corpus(v).cache()
      docs.count()
      import spark.implicits._

      // broad query: matches V/200 docs, co-occurring vocab ~ V/10
      val sigQ = Seq(1L -> "needle0").toDF("query_id", "qterms")
      val t0 = System.nanoTime()
      val nSig = TextAnalysis.significantTerms(docs, "doc_id", "text",
        sigQ, "query_id", "qterms", k = 10).count()
      val sigSecs = (System.nanoTime() - t0) / 1e9

      // ten typo'd probes (one edit away from real tokens) force the
      // full dist-2 variant build over the V-term vocabulary
      val fuzzQ = (0 until 10).map(i =>
          (i.toLong, Seq(f"tk${i * 997}%08dx", s"needle$i")))
        .toDF("query_id", "qterms")
      val t1 = System.nanoTime()
      val nFuzz = TextAnalysis.bm25TopKFuzzy(docs, "doc_id", "text",
        fuzzQ, "query_id", "qterms", k = 5, maxDist = 2).count()
      val fuzzSecs = (System.nanoTime() - t1) / 1e9

      val dir = graft.io.Spill.tempDir("graft-vocab-probe-") + "/idx"
      LexicalIndex.write(docs, "doc_id", "text", dir, nBuckets = 64)
      val t2 = System.nanoTime()
      val nKw = LexicalIndex.tfidfKeywordsIndexed(spark, dir, k = 3).count()
      val kwSecs = (System.nanoTime() - t2) / 1e9

      println(f"V=$v%d sig=$sigSecs%.2f (${sigSecs * 1e9 / v}%.0f ns/term, rows=$nSig%d) " +
        f"fuzzy2=$fuzzSecs%.2f (${fuzzSecs * 1e9 / v}%.0f ns/term, rows=$nFuzz%d) " +
        f"kw=$kwSecs%.2f (${kwSecs * 1e9 / v}%.0f ns/term, rows=$nKw%d)")
      docs.unpersist()
      graft.io.Spill.releaseAll()
    }
    spark.stop()
  }
}
