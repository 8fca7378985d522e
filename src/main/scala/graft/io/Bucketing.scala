package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination lever for repeated
  * large-scale joins (SURVEY §7.4 / 100 TB posture): writing both sides of
  * a frequently-joined pair bucketed by the join key lets every subsequent
  * join read co-located buckets and skip its Exchange entirely. One write
  * pays the shuffle once; every downstream join gets it for free, which is
  * the right trade whenever a fact table is joined more often than it is
  * rewritten.
  *
  * Bucketed writes go through the session catalog (`saveAsTable` — bucket
  * metadata lives in the metastore; a plain path write silently drops it).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides share
    * the bucket count, the planned join has NO shuffle exchange — verify
    * with [[shuffleExchangeCount]] (asserted in `BucketedJoinSpec`).
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Number of shuffle exchanges in a DataFrame's executed plan. */
  def shuffleExchangeCount(df: DataFrame): Int = {
    var plan = df.queryExecution.executedPlan
    plan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        plan = a.executedPlan
      case _ =>
    }
    var n = 0
    plan.foreach {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => n += 1
      case _ =>
    }
    n
  }
}
