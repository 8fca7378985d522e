package graft.model

import java.sql.Timestamp

/** Typed row models mirroring the reference's data model (SURVEY §1.2).
  *
  * `Purchase` / `CountAndTotal` correspond to the reference's JSON-Schema
  * generated POJOs (reference: `model-json/src/main/resources/schemas/
  * Purchase.json:1-19`, `CountAndTotal.json:1-15`) — here they are plain case
  * classes with Catalyst `Encoder`s derived via `Encoders.product`, so the
  * typed `Dataset[Purchase]` path and the untyped `DataFrame` path share one
  * schema definition.
  */
final case class Purchase(customerId: Int, productId: Int, quantity: Int)

/** Aggregate emitted by the purchases topology (reference:
  * `streams/PurchasesTopology.java:61-66`). `total` is Long there (int), but
  * the engine widens to Long/Double for 100 TB-scale sums.
  */
final case class CountAndTotal(count: Long, total: Double)

/** A keyed text record — the engine's analog of a Kafka `<String,String>`
  * record (reference: `streams/WordCountTopology.java:29`).
  */
final case class KeyedValue(key: String, value: String)

/** Dead-letter record produced by the resilience layer (SURVEY §2.5 R1):
  * the poison record plus the error that made it fail.
  */
final case class DeadLetter(key: String, value: String, error: String)

/** Audit-trail record (SURVEY §2.5 R2; reference:
  * `interceptors/FailProofInterceptor.java:36-38` uses key
  * "{appId},{topic},{partition}" -> offset). In the Spark engine the audit
  * source is `StreamingQueryProgress.sources`.
  */
final case class AuditOffset(appId: String, source: String, batchId: Long, endOffset: String)

/** lineitem row (FIXTURES.md §2) for the typed-Dataset scan path. */
final case class Lineitem(
    l_orderkey: Long,
    l_partkey: Long,
    l_suppkey: Long,
    l_linenumber: Int,
    l_quantity: Double,
    l_extendedprice: Double,
    l_discount: Double,
    l_tax: Double,
    l_returnflag: String,
    l_linestatus: String,
    l_shipdate: Timestamp)
