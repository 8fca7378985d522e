package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical-plan regression guard over the WHOLE battery: the plan shapes
  * audited by hand in round 2 (no cartesian products, no accidental
  * nested-loop joins, broadcast where intended, top-k without a global
  * sort) are pinned here so an edit that silently degrades a plan fails
  * the suite, not the benchmark.
  */
class PlanAuditSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    var plan = df.queryExecution.executedPlan
    plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        plan = a.executedPlan
      case _ =>
    }
    plan.toString
  }

  /** Queries whose design intentionally broadcast-joins a TINY side with
    * no equi-condition (the query vector; q98's vocab size; q99's node
    * count; q114's benchmark probe set; q123's L-row label table) — that
    * plans as a BroadcastNestedLoopJoin over a one-row or
    * label/benchmark-sized inner, which is exactly right.
    */
  private val singleRowBroadcast = Set(
    "q31_cosine_topk", "q32_ann_lsh", "q49_asof_join", "q93_filtered_ann",
    "q98_lm_bits", "q99_pagerank", "q101_token_drift", "q103_embedding_drift",
    "q114_semantic_decontam", "q123_nb_classify", "q125_lm_backoff",
    "q127_nb_chargram", "q128_ppl_mix",
    // q130/q131: the DSIR feature-mass totals roll up to one-row frames
    "q130_dsir_weights", "q131_dsir_select",
    // q132: q123's classify shape (L-row label broadcast)
    "q132_nb_hashed",
    // q133: anchors broadcast against the corpus scan (the q114 posture)
    "q133_hard_negatives",
    // q134/q135: the one-row (N, avgdl) corpus-stats broadcast
    "q134_bm25_topk", "q135_bm25_indexed",
    // q137/q138: the dense side's broadcast probe sweep (the q133
    // posture; q137 adds q134's stats broadcast)
    "q137_hybrid_rrf", "q138_ann_recall",
    // q139: the one-row corpus-N broadcast
    "q139_tfidf_keywords",
    // q140: the dense probe sweep feeding the MMR candidates
    "q140_mmr_diverse",
    // q141: q139's one-row corpus-N broadcast (folded from the index
    // stats deltas)
    "q141_tfidf_indexed",
    // q149/q150: q134/q135's one-row (N, avgdl) stats broadcast under
    // the fuzzy-expanded query set
    "q149_fuzzy_bm25", "q150_fuzzy_indexed",
    // q153/q154: q134's one-row (N, avgdl) stats broadcast under the
    // judged ranking
    "q153_ndcg", "q154_mrr",
    // q155/q156: the same one-row stats broadcast under the boolean
    // gates
    "q155_bool_bm25", "q156_bool_indexed",
    // q160/q161: the one-row corpus-N broadcast under the lift scoring
    "q160_significant_terms", "q161_sig_indexed",
    // q163: the src-probe broadcast sweep of the margin miner (the
    // q133/q137 dense posture — probe-batch-sized by contract);
    // q166 embeds the same exact-sweep subtree as its gold side
    "q163_bitext_margin", "q166_bitext_audit",
    // q172/q173: q123's L-row label broadcast inside the evaluated
    // classifier (labelScores keeps the classify scoring shape)
    "q172_nb_report", "q173_en_margin_auc",
    // q177/q204: the probe sweep broadcast against the corpus scan (the
    // q95/q133 dense posture; q204 ranks the identical prefScored frame)
    "q177_preference_pairs", "q204_dpo_pairs",
    // q179/q181: q123's L-row label broadcast inside the NB rater
    "q179_lang_kappa", "q181_avg_precision",
    // q205-q207: the heavy tier's DELIBERATE rep-row broadcast cross
    // join (heavyDocs — corpus replication by id arithmetic; the inner
    // is the rep-sized range frame) plus, for q206, q134's one-row
    // stats broadcast
    "q205_heavy_quality", "q206_heavy_bm25", "q207_heavy_tokens")

  test("no battery query plans a cartesian product or stray nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = planOf(fn(spark, sfDir))
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !singleRowBroadcast.contains(name)
      if (cartesian || bnlj) Some(s"$name: cartesian=$cartesian bnlj=$bnlj") else None
    }
    offenders shouldBe empty
  }

  test("flagship join broadcasts the dimension side") {
    planOf(SparkEntry.queries("q14_join_multiway")(spark, sfDir)) should
      include("BroadcastHashJoin")
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    planOf(SparkEntry.queries("q20_topk")(spark, sfDir)) should
      include("TakeOrderedAndProject")
  }

  /** Exchange-count ceilings for the queries the round-2 driver bench
    * flagged >2x baseline: their plans were re-audited (round-3) as the
    * shapes we want — any edit that grows a plan's shuffle count now fails
    * here, before it fails the benchmark. Counts are from sf0.001 plans;
    * AQE may coalesce at runtime but never adds exchanges.
    */
  private val exchangeCeilings = Map(
    "q26_dedup_exact" -> 2, // fingerprint hash-agg + final sort
    "q42_session_window" -> 2, // session agg + final sort
    "q43_sliding_window" -> 2, // window agg + final sort
    "q44_metadata_cols" -> 1, // map-only + final sort
    "q45_training_pipeline" -> 9, // dedup agg, semi, df gate, pair join, anti, sort
    // round-4 additions, audited at introduction:
    "q67_unpivot" -> 1, // expand is map-side; only the final sort shuffles
    "q68_map_agg" -> 3, // two-level agg + final sort
    "q69_dates" -> 1, // map-only battery + final sort
    "q70_listagg" -> 3, // distinct + collect agg + final sort
    "q71_condagg" -> 2, // conditional agg + final sort
    // round-8 additions, audited at introduction:
    "q82_bpe_vocab" -> 2, // token hash-agg + final sort
    "q83_decontaminate" -> 3, // probe BroadcastExchange + pair agg + final sort
    "q84_repetition" -> 1, // map-only RepetitionStats + final sort
    "q85_seq_pack" -> 2, // ONE shard repartition + final sort
    "q86_pii_redact" -> 1, // map-only regex battery + final sort
    "q87_quantize_int8" -> 1, // map-only HOF quantization + final sort
    "q88_chunk" -> 1, // map-only sequence+explode+slice + final sort
    "q89_bpe_train_hist" -> 1, // word hash-agg; top-k via TakeOrdered, no sort shuffle
    "q90_prep_e2e" -> 12, // q45's cleaning subplan (9) + survivor-text join + pack repartition + final sort
    "q91_source_mix" -> 4, // per-source totals agg + its broadcast + report agg + final sort
    "q92_profile" -> 3, // ONE multi-distinct agg (Expand, 2 exchanges) + final sort
    "q93_filtered_ann" -> 3, // broadcast id-filter + broadcast query vector + TakeOrdered
    "q94_topk_per_group" -> 2, // partial/final ObjectHashAggregate pair + final sort
    "q95_batch_ann" -> 4, // query-posting broadcast + pair dedupe + topk agg + final sort
    "q96_encode_ids" -> 1, // map-only BpeEncodeIds + final sort
    "q97_pack_ids" -> 5, // pack repartition + assignment-ids join + group concat + final sort
    "q98_lm_bits" -> 10, // bigram agg, context rollup, count join, vocab agg, per-doc agg + sort
    "q99_pagerank" -> 29, // edge dedup + 3 iterations x (degree join + edge join + contrib agg) + sort
    "q100_weighted_sample" -> 2, // partial/final bounded top-k agg + final sort
    "q101_token_drift" -> 8, // two token aggs, two total aggs, vocab join, TakeOrdered
    "q102_token_entropy" -> 3, // (doc,token) agg + per-doc agg + final sort
    "q103_embedding_drift" -> 8, // two dim-sum aggs + dim join + final agg + two count aggs
    "q104_dup_spans" -> 4, // fp agg + dup-set broadcast + one doc_id exchange (window AND agg) + sort
    "q106_dedup_priority" -> 4, // union feeds ONE fp hash agg + sort
    "q107_temperature_mix" -> 10, // totals agg + tiny window + rate broadcast + final agg + sort
    "q108_quantile_floor" -> 6, // threshold agg + broadcast back + sort (scoring stays map-only)
    "q111_tokenizer_fertility" -> 4, // one hash agg over the map-only projection + sort
    "q112_semantic_dedup_by" -> 12, // labels join + keeper agg + double anti-join + sort
    // round-9 additions, audited at introduction. The incremental
    // (`*_incr`) twins spill their history/candidate phases eagerly
    // (replay-stability, PLANS.md round-8), so the RETURNED plan these
    // ceilings guard is the post-spill tail — a regression that adds a
    // shuffle to the tail (e.g. losing the spill-scan's partitioning)
    // still fails here; the eager phases are plan-pinned by their
    // operator specs instead:
    "q105_dup_spans_incr" -> 1, // spilled span-merge scan + final sort only
    "q109_minhash_incr" -> 1, // spilled pair result scan + final sort only
    "q110_semantic_dedup" -> 3, // survivor anti-join ships ids + final sort
    "q113_simhash_incr" -> 1, // spilled pair result scan + final sort only
    "q114_semantic_decontam" -> 2, // probe BroadcastExchange + final sort
    "q115_corpus_shuffle" -> 1, // ONE range partitioning carries the sort
    "q116_shard_plan" -> 2, // map-only shard assign + balance agg + sort
    "q117_semantic_incr" -> 1, // spilled survivor scan + final sort only
    "q118_domain_rollup" -> 3, // host extract map-only + rollup agg + sort
    // round-10: the over-cap keeper window became the bounded
    // count+TopKAggregator aggregate (computed once, consumed by the
    // under anti-join and the keeper semi-join as broadcasts), dropping
    // the ceiling 6 -> 5 and removing the mega-domain single-task sort
    "q119_domain_gate" -> 5, // 2x keeper agg + 2 broadcasts + final sort
    "q120_url_canon" -> 1, // map-only canonicalization + final sort
    "q121_pq_adc" -> 0, // fused encode+ADC projection into TakeOrdered
    // per-DISTINCT-host census: host dedup agg + rules broadcast +
    // bounded prevailing-rule agg + mapping join + rollup (countDistinct
    // Expand pair) + sort — all |hosts|-sized, never |docs|-sized
    "q122_psl_domains" -> 12,
    // classify over the SPILLED model table (the fit runs once, eagerly;
    // this ceiling guards the returned scoring plan): label broadcast +
    // vocab cond join + per-(doc,label) agg + argmax agg + sort (the
    // round-11 bag-of-words collapse is the exchange-free TokenCounts
    // expression, so the scoring exchanges are unchanged)
    "q123_nb_classify" -> 8,
    // canon-key dedup: one min agg (partial/final) over the map-only
    // canonicalization + winner broadcast semi + final sort
    "q124_url_dedup" -> 4,
    // backoff trigram LM over the SPILLED model table (the training
    // corpus pass runs once, eagerly — this guards the returned scoring
    // plan): four tier rollup aggs + their broadcasts into the five
    // left joins, one-row mass/vocab broadcasts, per-doc agg + sort
    "q125_lm_backoff" -> 20,
    // round-11: perceptual-hash near-dup — band self-join (2 exchanges;
    // 12-byte band rows, never pixels), pair distinct agg + final sort
    "q126_image_phash" -> 4,
    // q123's scoring plan with the char-gram tokenizer + the battery
    // entry's one text repartition (parallelizes gram generation over
    // the single-file local scan)
    "q127_nb_chargram" -> 9,
    // mixing over the SPILLED scored frame (the q98 scoring runs once,
    // eagerly): quantile-cut agg + its broadcast, bucket-totals agg +
    // its broadcast, hash filter map-only, final sort
    "q128_ppl_mix" -> 7,
    // acoustic near-dup: q126's shape — band self-join (2 exchanges of
    // 12-byte band rows, never samples), pair distinct agg + final sort
    "q129_audio_fp" -> 3,
    // DSIR weights over the SPILLED raw feature frame (raw corpus
    // tokenized + hashed ONCE, eagerly): target bucket agg, spilled-scan
    // bucket agg, their one-row mass rollups + broadcasts into the
    // 256-row ratio spine, per-doc scoring agg, pruned-id left join,
    // final sort — every exchange past the spill carries bucket rows or
    // (doc, partials), never text
    "q130_dsir_weights" -> 14,
    // q130's scoring plan ending in Gumbel TakeOrdered instead of the
    // full-frame sort, + the k-bounded rank window
    "q131_dsir_select" -> 13,
    // q123's scoring plan over the md5-bucket-folded tokens (the fold is
    // a map-side transform, adding no exchange to q123's 8)
    "q132_nb_hashed" -> 8,
    // anchor BroadcastExchange + bounded per-anchor topk agg pair +
    // final sort — the corpus side never shuffles
    "q133_hard_negatives" -> 3,
    // batched BM25 over the SPILLED tf stats (the tokenize + semi-join
    // + tf aggregate corpus pass runs once, eagerly — this guards the
    // returned scoring plan): df agg over the spill scan + its
    // broadcast, the one-row (N, avgdl) corpus-stats agg + broadcast
    // (and the battery repartition feeding it), qterm broadcast,
    // (query, doc) micro-sum agg, bounded topk agg, final sort — every
    // shuffled row is integer stats, never text
    "q134_bm25_topk" -> 10,
    // retrieval against the PERSISTED index (build/append run eagerly at
    // entry construction): q134's tail with the spilled-tf scan replaced
    // by the partition-pruned posting scan + its term semi-join
    // broadcast, and the stats fold over the delta rows; the tiny
    // query-term subplan (battery repartition + probe tokenize) is
    // re-planned under each of its three broadcasts (ReuseExchange
    // collapses them at runtime)
    "q135_bm25_indexed" -> 15,
    // blocklist hits: one union of per-length positional-shingle
    // projections, the broadcast phrase join, one (doc, phrase) count
    // agg + final sort — the exchange carries matched hits only
    "q136_blocklist" -> 3,
    // hybrid fusion: q134's post-spill lexical tail + the dense probe
    // broadcast + its bounded topk agg, the tiny rankers-x-queries-x-k
    // fusion union agg + topk, final sort
    "q137_hybrid_rrf" -> 12,
    // tf-idf keywords over the SPILLED tf bag (the tokenize corpus pass
    // runs once, eagerly — ReuseExchange could NOT collapse the two
    // consumers, their subtrees differ): df agg over the spill scan +
    // the term join pair, one-row N broadcast, per-doc fold agg, final
    // sort
    "q139_tfidf_keywords" -> 7,
    // MMR: probe broadcast + bounded topk agg pair feeding candidates,
    // the id join-back, per-query collect agg, final sort
    "q140_mmr_diverse" -> 5,
    // indexed keywords: df agg over the posting scan + the term join
    // pair, one-row N fold from the stats deltas + its broadcast,
    // per-doc fold agg, final sort — the build/append phases run
    // eagerly at entry construction
    "q141_tfidf_indexed" -> 6,
    // one-shot phrase top-k: per-length shingle explode + broadcast
    // phrase join pair feeding one (query, doc) count agg (spilled),
    // bounded topk agg + the n_hits join-back broadcast, final sort —
    // exchanges carry (query, matching-doc) integer counts only
    "q142_phrase_topk" -> 7,
    // indexed phrase top-k: bucket-pruned posting scan + the broadcast
    // (query, offset, term) join, one candidate-doc collect agg into
    // the spilled counts, then q142's ranking tail — the build/append
    // phases run eagerly at entry construction
    "q143_phrase_indexed" -> 9,
    // proximity top-k (both paths): the candidate-span frame spills
    // eagerly (tokenize/posting phases run at spill time), so the
    // audited plan is the shared rank tail — topk agg over the spill
    // scan, the span rejoin broadcast, final sort
    "q144_proximity_topk" -> 3,
    "q145_proximity_indexed" -> 3,
    // windowed passage top-k (both paths): the q144 tail shape — the
    // best-window frame spills eagerly, topk agg over the spill scan,
    // the (n_hits, start) rejoin broadcast, final sort
    "q147_passage_topk" -> 3,
    "q148_passage_indexed" -> 3,
    // fuzzy BM25: the deletion-variant expansion subplan (vocab
    // distinct + variant explode + the broadcast query-variant join +
    // levenshtein verify) is re-planned under each broadcast consumer
    // of the q134/q135 scoring tail (ReuseExchange collapses at
    // runtime, the q135 pattern) — every expansion exchange carries
    // VOCABULARY terms/variants, bounded by |vocab|, never corpus rows
    "q149_fuzzy_bm25" -> 13,
    "q150_fuzzy_indexed" -> 21,
    // video near-dup: map-only synthesize+hash scans on both sides of
    // the slot-aligned band join (one side broadcasts at battery scale;
    // at corpus scale it becomes the fingerprintPairs sort-merge on
    // (f, band, bucket) — fingerprints only, never frames), the
    // distinct + matched-slot aggs, final sort
    "q146_video_fp" -> 4,
    // facet counts: the facet rides the tokenize projection (no corpus
    // join-back), broadcast query-term join, the (query, doc, facet)
    // distinct pair + the count agg, final sort — exchanges carry
    // matched (ids, facet) rows only
    "q151_facet_counts" -> 4,
    // passage snippets: the q147 rank tail (spilled best-window frame,
    // topk agg, the (n_hits, start) rejoin broadcast) + the queries x k
    // ranked frame BROADCAST back onto the corpus tokenize scan (a
    // fifth exchange here means the snippet join stopped broadcasting
    // and reshuffled the corpus), final sort
    "q152_passage_snippets" -> 4,
    // ranking-quality metrics: the full q134 scorer (its spill discipline
    // keeps the tf subtree re-planned under both the df rollup and the
    // scoring join), the overlap-judgment subtree (tokenize explode +
    // broadcast query-terms join + the (query, doc) grade agg), then
    // DCG agg + the per-query IDCG window agg + the final metric join
    // and sort — every exchange carries (query, doc, grade/rank)
    // integers, judgments are eval-pool-sized, never corpus rows
    "q153_ndcg" -> 21,
    "q154_mrr" -> 21,
    // boolean BM25: the q134 scoring shape (spilled tf under the df
    // rollup + score projection, one-row stats broadcast) plus the
    // role/must-count broadcasts and the mustNot anti-join of id
    // pairs; the indexed twin adds the build/append writes' exchanges
    // (the q135 pattern — build rows, not query rows)
    "q155_bool_bm25" -> 16,
    "q156_bool_indexed" -> 21,
    // more-like-this: the keyword fold and the seeds x k+1 ranking
    // spill eagerly (their multi-consumer subtrees would otherwise
    // re-plan per broadcast — measured 74 exchanges pre-spill), so the
    // audited tail is the two spill scans, the broadcast self-rank
    // join, the final sort
    "q157_more_like_this" -> 2,
    // indexed twin: build/append write exchanges + the same spilled
    // tail (the q135 build-row pattern)
    "q159_mlt_indexed" -> 2,
    // histogram facet: q151's shape over the derived n_chars bucket
    "q158_facet_histogram" -> 4,
    // significant terms: the spilled distinct (doc, term) projection
    // (posting scan for the indexed twin) re-plans under its three
    // consumers (match set, foreground, background df), the fg doc-id
    // equi-join, per-query totals + one-row N broadcasts, the bounded
    // top-k fold, final sort — every exchange carries (ids, term,
    // count) rows only
    "q160_significant_terms" -> 15,
    "q161_sig_indexed" -> 15,
    // ranker-eval leaderboard: the six ranked lists and the judgments
    // spill eagerly (each is queries x k integer rows), so the audited
    // tail is per-list dedup aggs over the spill scans, ONE labeled
    // union into the DCG aggregate, ONE shared IDCG window, the grid
    // explode + mean agg, final sort — the rankers' own scorer plans
    // are audited by their q134/q137/q149/q155/q157 rows
    "q162_ranker_eval" -> 26,
    // bitext margin mining: the src-side BroadcastExchange under each
    // neighborhood pass (the map-only pair projection runs once per
    // grouping — recomputing it is cheaper than spilling |src| x |tgt|
    // pairs), two bounded scored-top-k aggregate pairs, the
    // candidates x backward-neighborhood equi-join, the bounded
    // best-per-src aggregate pair, final sort — every exchange carries
    // (ids, micros) rows, never embeddings
    "q163_bitext_margin" -> 14,
    // the LSH twin: the candidate sims SPILL (their bucket shuffle
    // join would re-run under the tail's two groupings), so the
    // audited tail is two bounded top-k aggregate pairs over the spill
    // scan, the candidates x backward join, best-per-src, final sort
    "q164_bitext_lsh" -> 8,
    // the indexed twin: same spilled-candidate tail; the build write's
    // exchanges run eagerly in the row (the q135 build-row pattern)
    "q165_bitext_indexed" -> 8,
    // the mining audit: BOTH miners run inside the row (the exact tail
    // re-plans its map-only sweep per grouping, the LSH tail reads its
    // spill) + the gold-vs-mined join and two metric aggregates — every
    // exchange carries (ids, micros) rows
    "q166_bitext_audit" -> 22,
    // round-16: HTML extraction is a pure projection (block split,
    // density stats, filter, ordered re-join all via HOFs inside one
    // row) — ONLY the final sort may shuffle; any exchange before it
    // means the per-doc locality was broken
    "q167_html_extract" -> 1,
    // the lineage audit union: per-gate negated filters re-run the
    // dedup prefix and the anti-join/near-dup branches add their own
    // (34 at introduction; audit-run artifact, documented in PLANS.md)
    "q168_drop_lineage" -> 36,
    // unigram Viterbi is one expression eval per doc — map-only + the
    // battery ORDER BY (the q167 posture)
    "q169_unigram_segment" -> 1,
    // map-only token counting + ONE partial/final hash agg + final sort
    "q170_unigram_fertility" -> 2,
    // sentence split is one protect/mark/split generate projection —
    // map-only + the battery ORDER BY (the q167 posture)
    "q171_sentences" -> 1,
    // q123's classify + ONE spilled pair aggregate; the report tail
    // (per-truth/per-pred rollups + their full join + sort) runs over
    // the label-bounded spilled scan
    "q172_nb_report" -> 3,
    // labelScores' classify shape (scored + prior-only union) + the
    // margin aggregate + the truth join + ONE shared single-partition
    // sort feeding both rank windows (exact AUC is a holdout-sized
    // total sort by definition; rocAucBinned is the corpus path)
    "q173_en_margin_auc" -> 9,
    // ONE file-assembly aggregate (the synth side; real WARC arrives
    // as files) — the framing/parse itself is a map-only generate —
    // + the battery sort
    "q174_warc_parse" -> 2,
    // ONE hash exchange shared by the suffix-sum window and the
    // per-key fold (same partitioning) + the battery sort
    "q175_sft_assemble" -> 2,
    // hash-sides full join on id + battery sort (hash rows, never text)
    "q176_corpus_diff" -> 3,
    // probe broadcast + bounded top-k agg exchange + the cap window /
    // battery sort sharing the query partitioning
    "q177_preference_pairs" -> 3,
    // every Gopher metric is HOF arithmetic inside the row — map-only
    // + the battery sort (the q167 posture)
    "q178_gopher_rules" -> 1,
    // the NB rater's classify shape + the heuristic join + the
    // label-bounded spilled pair table's kappa folds
    "q179_lang_kappa" -> 6,
    // spilled sentence rows feed the distinct/df rollup, the hash
    // anti-join (16-byte md5 exchanges, never text), the ordered
    // rebuild + totals join, and the battery sort; +1 for the
    // doc-frame anchor join (id-only rows) that surfaces
    // zero-sentence docs per the one-row-per-input contract
    "q180_sentence_dedup" -> 8,
    // q173's margin scaffold + ONE single-partition ranking sort
    // shared by row_number and the running positive count
    "q181_avg_precision" -> 9,
    // map-only segmentation + plan-literal id lookup + battery sort
    // (the q96/q169 posture)
    "q182_unigram_ids" -> 1,
    // ONE nBins-bounded hash aggregate + the nBins-row cumulative
    // window's single-partition exchange — the corpus path never
    // sorts corpus rows (q173's global ranking sort is the
    // judged-holdout sibling)
    "q183_auc_binned" -> 2,
    // one nBins-bounded hash aggregate + the 16-row battery sort
    "q184_calibration" -> 2,
    // map-only repair chain (generated replace cascade) + battery sort
    "q185_fix_encoding" -> 1,
    // map-only line split/filter/rejoin + battery sort
    "q186_c4_lines" -> 1,
    // map-only micro-gap projection + ONE whole-frame hash aggregate
    "q187_brier" -> 1,
    // the RETURNED plan: docs semi-join against the spilled novel ids
    // + battery sort; the routing itself (groupBy reps, bloom lanes,
    // confirm anti-join) ran at construction into the spill — its
    // exchanges carry 16-byte digests only
    "q188_bloom_dedup" -> 3,
    // ORC scan + ONE partial/final hash agg + battery sort (the write
    // ran at construction)
    "q189_orc_roundtrip" -> 2,
    // WordPiece greedy walk is one expression eval per doc — map-only
    // + battery sort (the q169 posture)
    "q190_wordpiece" -> 1,
    // the recursive-CTE walk: the UnionLoop's per-step equi join, the
    // level rollup's partial/final pair, the final part join, and the
    // battery sort — iterative-join shaped by definition (the q99 class)
    "q191_recursive_cte" -> 7,
    // host distinct for the robots frame + the broadcast of the parsed
    // rules + the battery sort; the per-URL decision is map-only
    "q192_robots_gate" -> 6,
    // the e2e pretraining export's AUDITED TAIL: the pack shard
    // repartition + the assignment join + the battery sort. The clean/
    // pair/split/FIM stages run exactly once, eagerly, behind the two
    // Spill materializations (without them the cleaning subplan
    // re-executes per branch — 66 exchanges measured un-spilled); each
    // stage's own shape is audited by its q45/q52/q193/q194/q197 twin
    "q199_training_export" -> 3,
    // the SFT export's audited tail behind the spilled span walk (the
    // walk itself is q196's ONE key exchange, run once at spill time):
    // conv rollup agg + pack shard exchange + the two assignment
    // equi-joins + battery sort
    "q200_sft_export" -> 6,
    // the VAL export's audited tail behind the spilled split/sized
    // frames: pack shard exchange + battery sort + the two broadcast
    // id-equi joins (tokens back-join, train-overlap indicator)
    "q201_val_export" -> 4,
    // the artifact row READS BACK the written corpus: parquet scan +
    // battery sort only (the export chain ran at write time)
    "q202_export_artifact" -> 1,
    // two epochs over the ONE spilled train frame: per-epoch pack
    // shard exchanges + the union's battery sort + the two broadcast
    // assignment joins; the clean/pair/split stages ran once at spill
    "q203_epoch_export" -> 5,
    // the DPO pair tail over the q177 scored frame: the top-k agg
    // partial/final pair + the best/worst single hash aggregate +
    // the probe broadcast (battery sort rides the agg output)
    "q204_dpo_pairs" -> 3)

  test("regressed-in-r2 queries keep their audited shuffle budgets") {
    val over = exchangeCeilings.toSeq.sortBy(_._1).flatMap { case (name, cap) =>
      val plan = planOf(SparkEntry.queries(name)(spark, sfDir))
      val n = "Exchange".r.findAllIn(plan).length
      if (n > cap) Some(s"$name: $n exchanges > audited $cap") else None
    }
    over shouldBe empty
  }

  test("significant terms rank through the BOUNDED top-k aggregator, " +
      "not a vocabulary-sized collect_list fold") {
    // the per-query candidate set is the match set's co-occurring
    // vocabulary — at corpus scale a collect_list fold materializes it
    // all in ONE reducer row. The plan must show the O(k)-buffer
    // aggregator and no unbounded collect on the ranking tail.
    Seq("q160_significant_terms", "q161_sig_indexed").foreach { q =>
      val plan = planOf(SparkEntry.queries(q)(spark, sfDir))
      plan.toLowerCase should include("topktermsaggregator")
      (plan should not).include("collect_list")
    }
  }

  test("decontamination broadcasts the probe side (corpus scan stays map-only)") {
    val plan = planOf(SparkEntry.queries("q83_decontaminate")(spark, sfDir))
    plan should include("BroadcastHashJoin")
    plan should include("BuildRight") // probes are the broadcast build side
  }

  test("leakage-safe split broadcasts the CC label table " +
      "(corpus side never shuffles for the split decision)") {
    val plan = planOf(SparkEntry.queries("q193_leakage_split")(spark, sfDir))
    plan should include("BroadcastHashJoin")
  }

  test("filters reach the parquet scan (pushdown)") {
    val plan = planOf(SparkEntry.queries("q03_filter")(spark, sfDir))
    plan should include("PushedFilters")
    plan should include("GreaterThan(l_quantity")
  }
}
