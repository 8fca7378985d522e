package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right value with
  * `right.ts <= left.ts` within the same key (SURVEY §2.6 joins row:
  * "as-of = window/`last` over union"). Spark has no native ASOF JOIN;
  * the idiomatic composition is a tagged union + one window pass:
  *
  *   1. union left and right rows, tagging sides (right sorts BEFORE left
  *      at equal ts, so an exactly-simultaneous right row matches — the
  *      same inclusive semantics as DuckDB's `ON l.ts >= r.ts`);
  *   2. `last(value, ignoreNulls)` over (key, ts, side) rows-unbounded-
  *      preceding carries each right value forward to the left rows;
  *   3. keep the left side.
  *
  * Scale shape: ONE hash shuffle on the key + a per-partition sort — no
  * range-join explosion, no broadcast requirement on either side; at any
  * corpus size this is strictly cheaper than the naive
  * per-left-row max-ts subquery (a self-join) it replaces. Ties between
  * right rows at identical (key, ts) are broken arbitrarily — pass a
  * deterministic pre-dedup on the right side when that matters.
  */
object AsOfJoin {

  /** @param left  rows to enrich (all columns preserved)
    * @param right rows supplying the value; only keyCol/tsCol/valueCol used
    * @param asOfCol output column name for the carried right value
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, asOfCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(right.schema(valueCol).dataType))
    val r = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        col(valueCol).as("__rv")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.select(l.columns.map(col).toSeq: _*)
      .unionByName(r.select(l.columns.map(col).toSeq: _*))
      .withColumn(asOfCol, last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col).toSeq :+ col(asOfCol): _*)
  }
}
