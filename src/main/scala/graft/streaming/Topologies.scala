package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The reference's three topologies as `DataFrame => DataFrame` pipelines
  * (SURVEY §3). Each is plan-only — the same function serves batch
  * (`spark.read`) and streaming (`spark.readStream`) inputs, which is how
  * Structured Streaming is meant to be used: one logical plan, two run modes.
  *
  * Kafka-record framing: inputs carry (`key STRING`, `value STRING`) columns
  * like the Kafka source's projection `CAST(key AS STRING), CAST(value AS
  * STRING)`; production wiring only swaps the source/sink format to "kafka".
  */
object Topologies {

  /** WordCount (reference: `streams/WordCountTopology.java:25-39`):
    * flatMap to lowercase words, group, continuous count. The reference's
    * explicit repartition topic is replaced by the shuffle Catalyst plans
    * for the aggregation; partial (map-side) aggregation comes free from
    * HashAggregateExec, which Kafka Streams had to emulate with caching.
    * Streaming: run with outputMode("update") for per-key upserts.
    */
  def wordCount(lines: DataFrame, valueCol: String = "value"): DataFrame =
    lines
      .select(explode(TextFunctions.words(col(valueCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("count"))

  /** Purchases (reference: `streams/PurchasesTopology.java:49-73`): derive
    * composite key "{customerId}-{productId}", aggregate order count and
    * quantity total. selectKey + repartition() + groupByKey + aggregate
    * collapse into one groupBy — Catalyst inserts the single hash-partition
    * exchange itself (SURVEY §4.1), and AQE re-splits skewed customers,
    * which is exactly the skew scenario the reference's composite key was
    * designed around (`PurchasesTopology.java:39-47`).
    * Input: customerId INT, productId INT, quantity INT/DOUBLE columns
    * (use [[parsePurchases]] for the JSON-value framing).
    */
  def purchases(p: DataFrame): DataFrame =
    // concat (not concat_ws): null-propagates like SQL `||`, so a record
    // with a missing id groups under a NULL key instead of a silent "5"
    p.groupBy(concat(col("customerId"), lit("-"), col("productId")).as("k"))
      .agg(count(lit(1)).as("count"), sum(col("quantity").cast("decimal(38,9)")).cast("double").as("total"))

  /** JSON purchase deserialization (reference serde: `GsonSerde.java:27-40`):
    * `value` holds `{"customerId":..,"productId":..,"quantity":..}`.
    */
  def parsePurchases(records: DataFrame, valueCol: String = "value"): DataFrame =
    records.select(from_json(col(valueCol), org.apache.spark.sql.types.StructType
      .fromDDL("customerId INT, productId INT, quantity INT")).as("p")).select("p.*")

  /** Uppercase with poison-pill routing (reference: `main/Uppercase.java:33-36`
    * throws on value "quack"; `ReplaceThreadExceptionHandler.java:8-17` then
    * skips the record). Spark task retry would re-fail a deterministic
    * poison record, so the skip lives in the plan (SURVEY §2.5 R1): the
    * predicate splits the stream into an ok-path and a dead-letter path.
    */
  def uppercaseSplit(records: DataFrame, valueCol: String = "value",
      poison: Column => Column = _.contains("quack")): (DataFrame, DataFrame) = {
    val bad = poison(col(valueCol))
    val ok = records.where(!bad)
      .withColumn(valueCol, upper(col(valueCol)))
    val dead = records.where(bad)
      .withColumn("error", lit("poison value"))
    (ok, dead)
  }
}
