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
}
