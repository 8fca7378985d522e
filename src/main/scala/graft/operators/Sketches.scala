package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation (Apache DataSketches HLL, shipped with
  * Spark 4 as `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * The 100 TB pattern: distinct-count questions ("unique users per day /
  * per segment / overall") normally force a full shuffle of the raw keys
  * per question. Instead, aggregate each ingest slice ONCE into a
  * kilobyte-sized HLL sketch column; any later rollup — different grain,
  * different time range — is a cheap `hll_union_agg` over the sketch
  * table, never touching the raw data again. Sketches are commutative and
  * associative, so partial aggregation, AQE re-planning, and incremental
  * (per-micro-batch) appends all compose exactly.
  *
  * Accuracy is the standard HLL bound (~1.6%/sqrt(2^lgK)); the estimate
  * path is gated against exact counts in `SketchesSpec` rather than the
  * cross-engine oracle (sketch bytes are engine-specific).
  */
object Sketches {

  /** Build the per-grain sketch table: one row per `grainCols` group with
    * a binary HLL sketch of `keyCol` (plus the exact row count, which is
    * free at build time and often wanted next to the estimate).
    */
  def hllSketchTable(df: DataFrame, keyCol: String, lgK: Int,
      grainCols: String*): DataFrame =
    df.groupBy(grainCols.map(col): _*)
      .agg(
        hll_sketch_agg(col(keyCol), lit(lgK)).as("hll"),
        count(lit(1)).as("rows"))

  /** Roll a sketch table up to a coarser grain (or overall, with no
    * `grainCols`): distinct estimate + summed row count. Raw data is never
    * read — this is the query-time path.
    */
  def hllRollup(sketchTable: DataFrame, grainCols: String*): DataFrame = {
    val grouped =
      if (grainCols.isEmpty) sketchTable.groupBy()
      else sketchTable.groupBy(grainCols.map(col): _*)
    grouped.agg(
      hll_sketch_estimate(hll_union_agg(col("hll"), lit(true)))
        .as("distinct_est"),
      sum(col("rows")).as("rows"))
  }

  /** Sketch-based corpus-overlap estimate — the cheap pre-check before
    * any exact cross-corpus pass: two corpora's distinct n-gram shingle
    * sets reduced to one kilobyte-scale HLL sketch EACH (map-side
    * partial aggregation; the shuffle carries sketches, never
    * shingles), then inclusion–exclusion over the union sketch:
    * `|A∩B| ≈ |A| + |B| − |A∪B|` (clamped at 0 — HLL error can push
    * the difference slightly negative on disjoint corpora), Jaccard =
    * inter/union, containment of B = inter/|B| (the q83
    * decontamination metric's corpus-level estimate: "how much of the
    * benchmark's vocabulary does the corpus cover"). At 100 TB this
    * answers "is it WORTH running exact decontamination / diffing
    * against that other snapshot" for two corpus scans and kilobytes
    * of shuffle; the exact pipelines then run only when the estimate
    * says the overlap is material.
    *
    * Subtraction STACKS the two sketches' relative errors — treat the
    * intersection-derived numbers as decision signals (~few % of the
    * larger set size at default lgK), not measurements;
    * `SketchesSpec` gates them against exact counts on planted overlap.
    * Output: one row (a_distinct, b_distinct, union_est,
    * intersection_est, jaccard_est, containment_b_est).
    */
  def corpusOverlapEstimate(a: DataFrame, b: DataFrame, textCol: String,
      n: Int = 3, lgK: Int = 14): DataFrame = {
    require(n >= 1, "shingle width must be >= 1")
    def sketch(df: DataFrame, name: String) =
      df.select(explode(graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.words(col(textCol)), n))
          .as("__sh"))
        .agg(hll_sketch_agg(col("__sh"), lit(lgK)).as(name))
    sketch(a, "ha").crossJoin(sketch(b, "hb"))
      .select(
        hll_sketch_estimate(col("ha")).as("a_distinct"),
        hll_sketch_estimate(col("hb")).as("b_distinct"),
        hll_sketch_estimate(hll_union(col("ha"), col("hb")))
          .as("union_est"))
      .select(col("a_distinct"), col("b_distinct"), col("union_est"),
        greatest(col("a_distinct") + col("b_distinct") - col("union_est"),
          lit(0L)).as("intersection_est"))
      .select(col("a_distinct"), col("b_distinct"), col("union_est"),
        col("intersection_est"),
        (col("intersection_est").cast("double") / col("union_est"))
          .as("jaccard_est"),
        (col("intersection_est").cast("double") / col("b_distinct"))
          .as("containment_b_est"))
  }

  /** Count-Min frequency-sketch table: one binary CMS of `keyCol` per
    * `grainCols` group. Point frequency questions ("how often did key X
    * appear in slice Y / overall") then run against kilobytes per grain
    * instead of the raw data; like the HLL table it is mergeable, so
    * per-micro-batch appends compose. `eps`/`confidence` bound the
    * one-sided error: estimate ∈ [true, true + eps * totalCount] with
    * probability `confidence`.
    */
  def cmsSketchTable(df: DataFrame, keyCol: String,
      eps: Double, confidence: Double, grainCols: String*): DataFrame =
    df.groupBy(grainCols.map(col): _*)
      .agg(
        count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(7)).as("cms"),
        count(lit(1)).as("rows"))

  /** Estimate each requested key's frequency from a CMS sketch table,
    * merging all grains' sketches. DRIVER-SIDE by design: the merge pulls
    * one kilobyte-scale sketch per grain (bounded by grain cardinality,
    * never input size) — the same serving-edge posture as `ServingTable`.
    * Returns key -> estimate (one-sided: never under the true count).
    */
  def cmsLookup(sketchTable: DataFrame, keys: Seq[Any]): Map[Any, Long] = {
    val sketches = sketchTable.select(col("cms")).collect()
      .map(r => org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))))
    require(sketches.nonEmpty, "empty sketch table")
    val merged = sketches.reduce { (a, b) => a.mergeInPlace(b); a }
    keys.map(k => k -> merged.estimateCount(k)).toMap
  }
}
