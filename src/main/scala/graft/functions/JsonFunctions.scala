package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, MapType, StringType, VariantType}

/** Schema-less JSON document mutation (SURVEY §2.2 P2; reference:
  * `services/src/main/java/io/confluent/serde/JsonObjectSerde.java:24-30` —
  * the serde imposes NO schema, and
  * `services/src/test/java/io/confluent/serde/JsonObjectSerdeTests.java:61-64`
  * adds a `processed` field to whatever document arrived).
  *
  * The document is modeled as `map<string,variant>`: every top-level field
  * survives the round-trip with its exact JSON type (numbers stay numbers,
  * nested objects/arrays ride through as variant sub-trees), so mutation
  * needs no schema knowledge — the Spark-4 VARIANT type is precisely the
  * engine-native "dynamic JSON" the reference gets from Gson's JsonObject.
  *
  * With `spark.sql.mapKeyDedupPolicy=LAST_WIN` (set by [[graft.core.Engine]])
  * `map_concat` overwrites an existing key in place — matching RFC 7386
  * merge-patch update semantics and DuckDB's `json_merge_patch` output
  * byte-for-byte (verified for position-preserving overwrite and append).
  * Under the default EXCEPTION policy a duplicate key throws instead.
  *
  * Top-level only: a nested-object field in `fields` REPLACES the existing
  * sub-tree (no recursive merge), and a null value is stored as JSON null
  * (not a key deletion) — the two places full RFC 7386 goes further.
  */
object JsonFunctions {

  private val MapOfVariant: DataType = MapType(StringType, VariantType)

  /** Parse a JSON object column to `map<string,variant>`. */
  def parseObject(json: Column): Column = from_json(json, MapOfVariant)

  /** Set/overwrite top-level fields of a JSON object, preserving all other
    * fields and their types. Each value must be a VARIANT column (e.g.
    * `parse_json(lit("true"))`, or any `variant` expression).
    */
  def jsonSetFields(json: Column, fields: (String, Column)*): Column = {
    val patch = map(fields.flatMap { case (k, v) => Seq(lit(k), v) }: _*)
    to_json(map_concat(parseObject(json), patch))
  }
}
