package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Acoustic fingerprinting (64-frame energy hash) + Hamming near-dup
  * pairs — the audio twin of ImageHashSpec: the hash is pinned on a
  * hand-computed clip, the banded pair join is checked against a
  * brute-force popcount sweep, the non-WAV fallback is xxhash64-exact,
  * and the battery pipeline is partitioning-invariant.
  */
class AudioHashSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** 64-sample silent mono PCM WAV with sample 0 = 1. */
  private def oneSampleWav: Array[Byte] = {
    val wav = Multimodal.syntheticWav(8000, 1, 16, 128)
    ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN).putShort(44, 1.toShort)
    wav
  }

  test("energy hash of a hand-computed clip: one hot frame -> exactly bit 0") {
    // 64 samples -> one sample per frame; energy(0)=1, all others 0,
    // total=1. Bit f: energy*64 > 1 only at f=0.
    Multimodal.energyHashWav(oneSampleWav) shouldBe Some(1L)
  }

  test("energy hash rejects non-WAV, truncated, and sub-64-sample payloads") {
    Multimodal.energyHashWav("not audio at all".getBytes) shouldBe None
    Multimodal.energyHashWav(oneSampleWav.take(43)) shouldBe None
    // 32 samples: too short for a stable 64-frame envelope
    Multimodal.energyHashWav(Multimodal.syntheticWav(8000, 1, 16, 64)) shouldBe None
    // 8-bit PCM: the 16-bit sample walk would misread it — rejected
    Multimodal.energyHashWav(Multimodal.syntheticWav(8000, 1, 8, 128)) shouldBe None
  }

  test("equal seeds hash identically; a one-sample perturbation flips few bits") {
    val a = Multimodal.energyHashWav(
      Multimodal.syntheticWavKeyed(2L, 256, perturb = false)).get
    val b = Multimodal.energyHashWav(
      Multimodal.syntheticWavKeyed(2L, 256, perturb = false)).get
    val c = Multimodal.energyHashWav(
      Multimodal.syntheticWavKeyed(2L, 256, perturb = true)).get
    a shouldBe b
    // the +32768 shift moves frame 0's energy AND nudges the 1/64 mean,
    // flipping frame 0 plus two near-threshold frames — deterministic
    // integer math, pinned exactly at Hamming 3
    java.lang.Long.bitCount(a ^ c) shouldBe 3
  }

  test("non-WAV payloads fall back to xxhash64 of the raw bytes (seed 42)") {
    import spark.implicits._
    val payload = "definitely not audio".getBytes
    val fp = Multimodal.audioHash(
      Seq(MediaRecord(7L, "text", payload)).toDS()).head().getLong(1)
    val expected = Seq(Tuple1(payload)).toDF("p")
      .select(xxhash64(col("p"))).head().getLong(0)
    fp shouldBe expected
  }

  test("banded pairs == brute-force popcount sweep over the planted corpus") {
    import spark.implicits._
    val ids = (0L until 100L)
    def payload(id: Long): Array[Byte] = {
      val seed = id / 2
      Multimodal.syntheticWavKeyed(seed, 64 * (4 + (seed % 8).toInt),
        perturb = id % 2 == 1)
    }
    val fps = ids.map(id => id -> Multimodal.energyHashWav(payload(id)).get).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h)).toSet

    val got = Multimodal.syntheticWavHashPipeline(
        spark, ids.toDF("doc_id"), "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
    // the seed = id/2 planting yields at least some even/odd near-dups
    expected.count { case (a, b, _) => b == a + 1 && a % 2 == 0 } should be > 10
  }

  test("audio fingerprints ride the cross-run fingerprint table") {
    import spark.implicits._
    def media(ids: Seq[Long]) = ids.toDF("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val seed = id / 2
        MediaRecord(id, "audio", Multimodal.syntheticWavKeyed(
          seed, 64 * (4 + (seed % 8).toInt), perturb = id % 2 == 1))
      })
    val table = java.nio.file.Files
      .createTempDirectory("audio-fp-").toString
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // epoch 1: even ids only (the unperturbed halves) — no near-dups yet
    val e1 = pairs(Dedup.incrementalFingerprintPairs(
      Multimodal.audioHash(media(0L until 40L by 2)), table, batchId = "e1"))
    // epoch 2: the odd perturbed twins — every near-dup pair is CROSS-run
    val e2 = pairs(Dedup.incrementalFingerprintPairs(
      Multimodal.audioHash(media(1L until 40L by 2)), table, batchId = "e2"))
    // the two epochs together recover exactly the one-shot sweep
    val oneShot = pairs(Multimodal.syntheticWavHashPipeline(
      spark, (0L until 40L).toDF("doc_id"), "doc_id"))
    (e1 ++ e2) shouldBe oneShot
    e2 should not be empty // the planted twins surfaced across runs
  }

  test("pipeline is partitioning-invariant") {
    import spark.implicits._
    val ids = (0L until 60L).toDF("doc_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.syntheticWavHashPipeline(spark, df, "doc_id")
        .orderBy("id_a", "id_b").collect().toSeq
    run(ids.repartition(7)) shouldBe run(ids.coalesce(1))
  }
}
