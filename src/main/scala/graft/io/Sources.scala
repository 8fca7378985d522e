package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source abstraction — the engine's `Consumed` analog (reference:
  * `streams/PurchasesTopology.java:58` `Consumed.with(STRING_SERDE,
  * PURCHASE_SERDE)`, offset control `main/Uppercase.java:50`
  * `AUTO_OFFSET_RESET_CONFIG "latest"`).
  *
  * Every source yields the engine's record framing: the payload columns plus
  * (when requested) the record-metadata triple the reference's pass-through
  * processor captured in a thread-local (`resilience/
  * RetrieveContextTransformer.java:9-22`) — here first-class columns
  * `topic STRING, partition INT, offset LONG`, carried through plans like
  * any other column (SURVEY §2.2 P6).
  *
  * Each source has a batch twin (`read`) and a streaming form
  * (`readStream`) producing the SAME schema, so one topology function
  * serves both run modes.
  */
sealed trait RecordSource {
  def read(spark: SparkSession): DataFrame
  def readStream(spark: SparkSession): DataFrame
}

/** File-backed source (S7: parquet/csv/json/orc — any Spark file format).
  *
  * Record metadata for files: `topic` = source file path, `partition` = 0
  * (a file has no broker partitions; re-keying decides parallelism),
  * `offset` = `_metadata.row_index`, the record's durable position in its
  * file — the honest analog of a Kafka offset, and like it, stable across
  * re-reads regardless of how Spark splits the file into tasks.
  */
final case class FileSource(
    path: String,
    format: String = "parquet",
    schemaDDL: Option[String] = None,
    options: Map[String, String] = Map.empty,
    withMetadata: Boolean = false) extends RecordSource {

  private def project(df: DataFrame): DataFrame =
    if (!withMetadata) df
    else df.select(col("*"),
      col("_metadata.file_path").as("topic"),
      lit(0).as("partition"),
      col("_metadata.row_index").as("offset"))

  override def read(spark: SparkSession): DataFrame = {
    val r = spark.read.format(format).options(options)
    project(schemaDDL.fold(r)(s => r.schema(StructType.fromDDL(s))).load(path))
  }

  override def readStream(spark: SparkSession): DataFrame = {
    val r = spark.readStream.format(format).options(options)
    // streaming file sources require an explicit schema
    val schema = schemaDDL.map(StructType.fromDDL).getOrElse(
      spark.read.format(format).options(options).load(path).schema)
    project(r.schema(schema).load(path))
  }
}

/** Kafka source — the production wiring point (S1/S2/S6). Compiles against
  * Spark's public reader API only; running it needs the
  * `spark-sql-kafka-0-10` connector on the classpath (not shipped in this
  * container — SURVEY §7.4), which is why every test drives the same
  * topologies through [[FileSource]] or `MemoryStream` instead.
  *
  * `startingOffsets` is the reference's `AUTO_OFFSET_RESET_CONFIG` analog;
  * key/value arrive as Kafka's binary columns cast to STRING, and the
  * metadata triple comes from the source's native `topic`/`partition`/
  * `offset` columns.
  */
final case class KafkaSource(
    bootstrapServers: String,
    subscribe: String,
    startingOffsets: String = "latest",
    withMetadata: Boolean = false) extends RecordSource {

  private def frame(df: DataFrame): DataFrame = {
    val base = df.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"))
    if (withMetadata) base else base.select("key", "value")
  }

  private def reader(df: => DataFrame): DataFrame = frame(df)

  /** Reader options for the batch path — exposed (with [[streamOptions]])
    * so the environment-blocked wiring stays spec-assertable without the
    * connector jar (`SourcesSinksSpec`): the option names/values are the
    * contract that would otherwise rot silently as compile-only code.
    */
  def batchOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> subscribe)

  /** [[batchOptions]] plus the start position — the reference's
    * `AUTO_OFFSET_RESET_CONFIG` (S6) applies to the streaming consumer.
    */
  def streamOptions: Map[String, String] =
    batchOptions + ("startingOffsets" -> startingOffsets)

  override def read(spark: SparkSession): DataFrame = reader(
    spark.read.format("kafka").options(batchOptions).load())

  override def readStream(spark: SparkSession): DataFrame = reader(
    spark.readStream.format("kafka").options(streamOptions).load())
}
