package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.words

/** Distribution-drift measurement between two corpus slices — the
  * monitoring pass a continuously-ingesting training pipeline runs before
  * mixing a new crawl batch in: per-token Jensen-Shannon divergence
  * contributions pinpoint WHICH tokens moved (a spam burst, a new
  * boilerplate template, a language shift), and their sum is the overall
  * JSD (0 = identical distributions, 1 bit = disjoint).
  *
  * Shape at 100 TB: each side collapses to a (token, count) table in one
  * hash aggregate — the corpora never meet; only the two aggregated
  * vocabularies full-outer-join, and the totals enter as one-row
  * broadcasts. Same tokenizer as [[TextAnalysis]] ([[words]]), so the
  * DuckDB oracle replays counts, probabilities, and log math exactly.
  */
object Drift {

  /** Top-`topK` tokens by JSD contribution between `a` and `b` (ties
    * break by token so the cutoff is deterministic and replayable).
    * Output: (token, cnt_a, cnt_b, jsd_bits) with jsd_bits the token's
    * contribution to JSD(a,b) in bits, rounded to 6 decimals.
    */
  def tokenJsd(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    val ca = tokenCounts(a, textCol, "cnt_a")
    val cb = tokenCounts(b, textCol, "cnt_b")
    val ta = ca.agg(sum(col("cnt_a")).as("tot_a")) // one row; broadcast
    val tb = cb.agg(sum(col("cnt_b")).as("tot_b"))
    // 0*log(0) := 0 — a token absent from one side contributes only the
    // other side's term
    def term(x: Column, m: Column): Column =
      when(x > 0, x * log2(x / m)).otherwise(lit(0.0))
    val p = col("cnt_a").cast("double") / col("tot_a")
    val q = col("cnt_b").cast("double") / col("tot_b")
    val m = (p + q) / lit(2.0)
    ca.join(cb, Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(ta).crossJoin(tb)
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        round(lit(0.5) * term(p, m) + lit(0.5) * term(q, m), 6).as("jsd_bits"))
      .orderBy(col("jsd_bits").desc, col("token"))
      .limit(topK)
  }

  private def tokenCounts(df: DataFrame, textCol: String,
      cntName: String): DataFrame =
    df.select(explode(words(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as(cntName))

  /** Embedding-space drift: cosine similarity between the centroids of
    * two corpus slices (1 = same direction, 0 = orthogonal) — catches a
    * semantic shift token counts can't see (same vocabulary, different
    * topics). Output: one row (n_a, n_b, centroid_cos).
    *
    * Computed as the cosine of the per-dimension MEAN vectors (means,
    * not sums, so per-dimension products stay in [-1, 1] regardless of
    * corpus size; cosine is scale-invariant either way). Each slice
    * collapses to `dim` rows in one hash aggregate (explode + group by
    * dimension); the sums are DECIMAL(38,12)-exact (order-independent,
    * engine-replayable — the q99 trick), the per-dimension products
    * quantize to pico-unit longs (`round(ma·mb·1e12)`) so the THREE
    * dot products are order-invariant long sums too (a raw double sum
    * over the dim rows depends on partition merge order), and the
    * final cosine is one double expression over three longs. Rounded
    * to 6 decimals.
    */
  def embeddingCentroidCos(a: DataFrame, b: DataFrame,
      embCol: String): DataFrame = {
    def dimSums(df: DataFrame, sName: String) =
      df.select(posexplode(col(embCol)).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(sum(col("x").cast("decimal(38,12)")).as(sName))
    val na = a.agg(count(lit(1)).as("n_a")) // one row; broadcast
    val nb = b.agg(count(lit(1)).as("n_b"))
    def pico(x: Column) = round(x * 1e12).cast("long")
    dimSums(a, "sa").join(dimSums(b, "sb"), Seq("dim"))
      .crossJoin(na).crossJoin(nb)
      .select(col("n_a"), col("n_b"),
        (col("sa").cast("double") / col("n_a")).as("ma"),
        (col("sb").cast("double") / col("n_b")).as("mb"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(pico(col("ma") * col("mb"))).as("ab"),
        sum(pico(col("ma") * col("ma"))).as("aa"),
        sum(pico(col("mb") * col("mb"))).as("bb"))
      .select(col("n_a"), col("n_b"),
        round(col("ab").cast("double") /
          sqrt(col("aa").cast("double") * col("bb").cast("double")), 6)
          .as("centroid_cos"))
  }
}
