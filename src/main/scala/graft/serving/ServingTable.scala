package graft.serving

import java.util.concurrent.ConcurrentSkipListMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame

/** A continuously-maintained, driver-resident serving view — the engine's
  * analog of the reference's queryable RocksDB state store (reference:
  * `streams/PurchasesTopology.java:53-55` `Materialized.as(...)`, read side
  * `services/WordCountService.java:88-108`).
  *
  * Rows arrive from a streaming query's `foreachBatch` upsert (update-mode
  * semantics: latest value per key wins) and are served to the HTTP layer
  * with the reference's three access patterns: point `get`, sorted
  * prefix/range scan, and full scan (scatter-gather merge is implicit — the
  * driver sees all partitions' state, SURVEY §2.4 Q4).
  *
  * Scale posture: the serving view is the *edge* of the engine — the one
  * place `collect()` is legitimate (SURVEY §7.4). It holds only the
  * aggregated/keyed result (bounded by key cardinality, not input size);
  * the 100 TB of raw data never lands here. A multi-node serving tier would
  * shard this map by key range — the API below is already range-based so
  * that split would be mechanical.
  *
  * That posture is only safe while key cardinality actually IS bounded, so
  * `maxEntries` makes the bound explicit: an upsert that would grow the
  * table past it fails loud ([[ServingTable.CapacityExceeded]]) instead of
  * slow-OOMing the driver on a high-cardinality key stream (the reference's
  * RocksDB store is disk-backed and has no such failure mode — a map does).
  * Updates to EXISTING keys never trip the guard; size the cap to the
  * expected keyspace, or shard the serving tier when the keyspace outgrows
  * one process.
  */
final class ServingTable(val name: String, val keyCol: String,
    val maxEntries: Int = ServingTable.DefaultMaxEntries) {

  require(maxEntries > 0, "maxEntries must be positive")

  private val state = new ConcurrentSkipListMap[String, Map[String, Any]]()

  /** Upsert one micro-batch (or a batch DataFrame) of keyed rows. Throws
    * [[ServingTable.CapacityExceeded]] on the first NEW key past
    * `maxEntries` (rows already applied stay applied — the maintenance
    * query then fails its batch and surfaces the error, rather than
    * retrying into the same wall).
    */
  def upsert(batch: DataFrame): Unit = {
    val cols = batch.columns.filter(_ != keyCol)
    batch.collect().foreach { row =>
      val k = Option(row.getAs[Any](keyCol)).map(_.toString).getOrElse("null")
      if (state.size() >= maxEntries && !state.containsKey(k))
        throw new ServingTable.CapacityExceeded(name, maxEntries)
      state.put(k, cols.map(c => c -> row.getAs[Any](c)).toMap)
    }
  }

  /** Point lookup (reference: `ReadOnlyKeyValueStore.get`,
    * `WordCountService.java:101`).
    */
  def get(key: String): Option[Map[String, Any]] = Option(state.get(key))

  /** Sorted range scan, both bounds inclusive (reference:
    * `PurchasesService.java:113` `store.range(from, to)`).
    */
  def range(from: String, to: String): Seq[(String, Map[String, Any])] =
    state.subMap(from, true, to, true).asScala.toSeq

  /** All entries of a key prefix — the reference encodes this as
    * `range(key + "-00000", key + "-99999")`; a real lexicographic prefix
    * scan is strictly more general and stays sargable.
    */
  def prefix(p: String): Seq[(String, Map[String, Any])] =
    // tailMap positions at the prefix in O(log n); a dropWhile from the
    // first key would make every prefix scan O(total keys)
    state.tailMap(p, true).asScala.iterator.takeWhile(_._1.startsWith(p)).toSeq

  /** Full scan (scatter-gather analog, reference:
    * `PurchasesService.java:58-94` — the merge loop disappears because the
    * driver holds every partition's state).
    */
  def all: Seq[(String, Map[String, Any])] = state.asScala.toSeq

  def size: Int = state.size()
}

object ServingTable {

  /** Default key-cardinality bound: ~1M entries of a small aggregate row
    * is on the order of a few hundred MB of driver heap — comfortably
    * inside the default driver sizing, and two orders of magnitude above
    * the reference demo's keyspaces.
    */
  val DefaultMaxEntries: Int = 1 << 20

  final class CapacityExceeded(table: String, max: Int)
      extends IllegalStateException(
        s"serving table '$table' is full ($max entries): the key stream's " +
          "cardinality exceeds the configured bound; raise maxEntries, " +
          "aggregate to a coarser key, or shard the serving tier")
}
