package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: match points to intervals — or rows whose numeric
  * values lie within a band of each other — WITHOUT the O(n·m) theta join
  * Spark would otherwise plan (a pure range predicate has no equi-key, so
  * Catalyst falls back to BroadcastNestedLoopJoin/Cartesian).
  *
  * The scale path is bucketization: quantize the value axis into buckets of
  * width `step`; a point lands in exactly one bucket, an interval [lo, hi]
  * is exploded to every bucket it overlaps. Joining on the bucket id turns
  * the range predicate into an equi-join (one hash shuffle, horizontally
  * scalable) and the exact predicate is re-applied to the candidates, so
  * the result is IDENTICAL to the theta join for any `step` — `step` is a
  * pure cost dial:
  *
  *   - `step` >> interval span: each interval explodes to ~1-2 buckets
  *     (minimal duplication) but each bucket holds a wide value range
  *     (more false candidates filtered after the join);
  *   - `step` << interval span: tight candidate sets, but every interval
  *     replicates to span/step buckets.
  *
  * Rule of thumb: `step` ≈ the typical interval span. Skew note: if the
  * value distribution concentrates in one bucket, AQE's skew-join split
  * applies (the join IS a plain equi-join); shrinking `step` is the
  * pre-planned dial.
  */
object RangeJoin {

  private def bucketOf(v: Column, step: Double): Column =
    floor(v / lit(step)).cast("long")

  /** Join `points` rows to every `intervals` row with
    * `lo <= point <= hi` (inclusive both ends). Returns
    * points.* ++ intervals.* for each match. Column name collisions must be
    * resolved by the caller beforehand (standard join hygiene).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      step: Double): DataFrame = {
    require(step > 0, "step must be positive")
    val p = points.withColumn("__bucket", bucketOf(col(pointCol), step))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(loCol), step), bucketOf(col(hiCol), step))))
    p.join(i, Seq("__bucket"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: every (a, b) pair whose closed intervals
    * intersect (`aLo <= bHi && bLo <= aHi`). Both sides explode to the
    * buckets they span; a pair sharing k buckets would match k times, so
    * the join keeps only the FIRST shared bucket — `greatest(bucketOf(aLo),
    * bucketOf(bLo))` — which counts each pair exactly once WITHOUT a
    * distinct (no second shuffle). Returns a.* ++ b.*; resolve column name
    * collisions before calling.
    */
  def intervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, step: Double): DataFrame = {
    require(step > 0, "step must be positive")
    val ae = a.withColumn("__bucket",
      explode(sequence(bucketOf(col(aLo), step), bucketOf(col(aHi), step))))
    val be = b.withColumn("__bucket",
      explode(sequence(bucketOf(col(bLo), step), bucketOf(col(bHi), step))))
    ae.join(be, Seq("__bucket"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi) &&
        col("__bucket") === greatest(bucketOf(col(aLo), step), bucketOf(col(bLo), step)))
      .drop("__bucket")
  }

  /** Band self-join: pairs (anchor, member) where the member's value lies
    * within ±`band` of the anchor's value. Anchors may be a filtered subset
    * (`anchors`), members the full set — the classic similarity-band shape.
    */
  def bandJoin(anchors: DataFrame, members: DataFrame, valCol: String,
      idColAnchor: String, idColMember: String, band: Double,
      step: Double): DataFrame = {
    val i = anchors.select(col(idColAnchor).as("anchor_id"),
      (col(valCol) - band).as("__lo"), (col(valCol) + band).as("__hi"))
    val p = members.select(col(idColMember).as("member_id"), col(valCol))
    pointInInterval(p, valCol, i, "__lo", "__hi", step)
      .select(col("anchor_id"), col("member_id"))
  }
}
