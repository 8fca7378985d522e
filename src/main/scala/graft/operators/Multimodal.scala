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

/** One sampled frame of a media payload (frame-sample stub output). */
final case class MediaFrame(media_id: Long, frame_idx: Int, ts_ms: Int,
    width: Int, height: Int)

/** Fixed-width feature vector extracted from a payload (stub embedding). */
final case class MediaFeatures(media_id: Long, features: Array[Float])

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

  /** Frame sampling: one output row per sampled timestamp — a generator
    * (1 → N rows), so the plan is a per-partition flatMap, exactly the
    * shape a real video decoder needs (seek once per payload, emit frames).
    * STUB frame contents; REAL row-explosion plumbing: output cardinality
    * = ceil(duration / everyMs), capped to protect against adversarial
    * metadata claiming hours of video.
    */
  def frameSample(media: Dataset[MediaRecord], everyMs: Int,
      maxFrames: Int = 64): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    require(everyMs > 0, "everyMs must be positive")
    media.mapPartitions { records =>
      records.flatMap { r =>
        val (w, h, d) = fakeDecode(r.payload)
        val n = math.min(((d + everyMs - 1) / everyMs), maxFrames)
        (0 until n).iterator.map(i => MediaFrame(r.media_id, i, i * everyMs, w, h))
      }
    }
  }

  /** Resize: metadata-only transform in the stub (a real implementation
    * rewrites payload bytes per partition with an open codec); aspect-fit
    * into the given bounding box, never upscaling.
    */
  def resizeMeta(meta: Dataset[MediaMeta], maxW: Int, maxH: Int): Dataset[MediaMeta] = {
    import meta.sparkSession.implicits._
    meta.map { m =>
      val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
      m.copy(width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** Feature extraction: fixed-width float vector per payload — the
    * embedding-model stage of a multimodal pipeline. STUB features (byte
    * histogram folded to `dim`, L2-normalized — deterministic); REAL
    * shape: `array<float>` column ready for the similarity operators
    * ([[Similarity.bruteForceTopK]] / [[Similarity.lshTopK]]).
    */
  def featureExtract(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val acc = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          acc(java.lang.Math.floorMod(r.payload(i), dim)) += 1f
          i += 1
        }
        var norm = 0.0
        acc.foreach(v => norm += v * v)
        val inv = if (norm == 0) 0f else (1.0 / math.sqrt(norm)).toFloat
        MediaFeatures(r.media_id, acc.map(_ * inv))
      }
    }
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
