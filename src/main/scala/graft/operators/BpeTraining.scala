package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Learn a BPE merges table FROM the corpus — the other half of the
  * tokenizer story ([[graft.functions.Bpe]] encodes under a table; this
  * trains one), shaped the way production tokenizer trainers scale:
  *
  *   1. ONE corpus pass builds the word histogram — explode pre-tokens,
  *      hash-aggregate counts. This is the only corpus-proportional step
  *      and it is a plain Spark aggregate (partial map-side combine, one
  *      shuffle of (word, count) pairs, NOT corpus text).
  *   2. The histogram — bounded by DISTINCT words, a language-sized
  *      constant further capped by `maxDistinctWords` (top-by-count, so
  *      what's dropped is the long unique tail that can never reach
  *      `minCount` influence anyway) — collects to the driver, where the
  *      classic greedy merge loop runs ([[Bpe.trainFromCounts]]).
  *
  * At 100 TB step 1 dominates and parallelizes perfectly; step 2 is
  * independent of corpus size. The trained table is well-formed by
  * construction (each side is a char or an earlier output), so it plugs
  * directly into [[Bpe.encodeWordWith]] and inherits the oracle-replay
  * equivalence the embedded table's invariant buys.
  */
object BpeTraining {

  /** The corpus word histogram under the BPE pre-tokenizer
    * ([[graft.functions.TextFunctions.BpeTokenPattern]]): one row per
    * distinct pre-token with its occurrence count, heaviest first,
    * capped at `maxDistinctWords`.
    */
  def wordHistogram(docs: DataFrame, textCol: String,
      maxDistinctWords: Int = 1 << 20): DataFrame = {
    require(maxDistinctWords > 0, "maxDistinctWords must be positive")
    docs
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.functions.TextFunctions.BpeTokenPattern), lit(0)))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(maxDistinctWords)
  }

  /** Train `nMerges` BPE merges from the corpus. Deterministic for a
    * given corpus (histogram ties break lexicographically), independent
    * of partitioning.
    */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      minCount: Long = 2L,
      maxDistinctWords: Int = 1 << 20): Vector[(String, String)] = {
    val hist = wordHistogram(docs, textCol, maxDistinctWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    Bpe.trainFromCounts(hist, nMerges, minCount)
  }
}
