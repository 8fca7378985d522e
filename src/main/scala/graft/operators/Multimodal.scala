package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Opaque binary payload with typed metadata — the multimodal column model
  * (SURVEY §2.6 north-star): image/audio/video travel as `binary` plus a
  * metadata struct; heavy decode work runs batched per partition.
  */
final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

/** Decoded-media metadata. Width/height/duration come from the decode stub. */
final case class MediaMeta(media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int, duration_ms: Int)

object Multimodal {

  /** Ingest any column as an opaque binary payload with a kind tag.
    * At 100 TB the payload column stays untouched by Catalyst (no codegen on
    * the bytes) and the *metadata* columns carry predicates, so scans prune
    * on metadata without reading payload pages (parquet column split).
    */
  def ingest(df: DataFrame, idCol: String, srcCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(srcCol).cast("binary").as("payload"))

  /** Batched decode over partitions — the Scala analog of `mapInPandas`:
    * one iterator per partition, so a real decoder would amortize codec
    * setup across the whole batch rather than paying it per row.
    *
    * STUB: the container has no image/audio codecs, so the decode step is a
    * deterministic fake derived from payload bytes (NOT a real decoder). The
    * Spark-side plumbing — schema, typed Dataset, partition-batched
    * iteration, metadata struct — is the real, tested surface; swap
    * `fakeDecode` for a JNI/javacv call in production.
    */
  def decode(media: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition setup would open the codec once, here
      records.map { r =>
        val (w, h, d) = fakeDecode(r.payload)
        MediaMeta(r.media_id, r.kind, r.payload.length.toLong, w, h, d)
      }
    }
  }

  /** Deterministic fake decode: metadata from payload length + a byte mix. */
  private def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    var mix = 0x9E3779B9
    var i = 0
    while (i < math.min(payload.length, 64)) { mix = mix * 31 + payload(i); i += 1 }
    val w = 160 + math.floorMod(mix, 1760)
    val h = 90 + math.floorMod(mix >> 8, 990)
    val d = 1000 + math.floorMod(payload.length * 40, 600000)
    (w, h, d)
  }

  /** End-to-end stub pipeline over the documents table: text bytes stand in
    * for media payloads; output is the typed metadata view.
    */
  def documentMediaPipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = ingest(docs, "doc_id", "text", "image").as[MediaRecord]
    decode(media).toDF()
  }
}
