package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Per-frame video fingerprints + slot-aligned matched-frame near-dup
  * pairs: the RIFF/DIB parse is pinned against the image path (one
  * [[Multimodal.ahashPixels]] core — identical pixels, identical hash),
  * the banded pair join is checked against a brute-force per-slot
  * popcount sweep, the non-AVI fallback is xxhash64-exact, and the
  * battery pipeline is partitioning-invariant — the video member of the
  * ImageHashSpec/AudioHashSpec family.
  */
class VideoHashSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("frame hash of a hand-patched frame: one bright pixel -> bit 0 " +
      "(the ImageHashSpec pin through the AVI parse)") {
    // 1-frame 8x8 clip; the single movi frame's pixel plane starts at
    // byte 232 (12 RIFF + 200 hdrl LIST + 12 movi LIST head + 8 00db
    // head). Zero it, then set stored pixel (0,0) white: cell (i,j)
    // samples pixel (i,j) exactly, gray(0,0)=255, sum=255, and
    // gray*64 > 255 only at idx 0 — the ImageHashSpec arithmetic.
    val p = Multimodal.syntheticAviKeyed(0L, 8, 8, 1, perturb = false)
    val stride = 24
    java.util.Arrays.fill(p, 232, 232 + stride * 8, 0.toByte)
    p(232) = 255.toByte; p(233) = 255.toByte; p(234) = 255.toByte
    Multimodal.frameHashesAvi(p) shouldBe Some(Seq(1L))
  }

  test("frame 0 of a keyed AVI == the keyed BMP at seed*31 (one shared " +
      "pixel formula and hash core across image and video)") {
    // the AVI frame-f seed is seed*31 + f, so frame 0 of video seed 2
    // is pixel-identical to the image at seed 62 — parse parity end to
    // end through two different containers
    Multimodal.frameHashesAvi(
      Multimodal.syntheticAviKeyed(2L, 10, 6, 3, perturb = false)
    ).get.head shouldBe
      Multimodal.ahashBmp(
        Multimodal.syntheticBmpKeyed(62L, 10, 6, perturb = false)).get
  }

  test("equal seeds hash identically; the one-pixel perturbation hits " +
      "frame 0 only") {
    val a = Multimodal.frameHashesAvi(
      Multimodal.syntheticAviKeyed(2L, 10, 6, 3, perturb = false)).get
    val b = Multimodal.frameHashesAvi(
      Multimodal.syntheticAviKeyed(2L, 10, 6, 3, perturb = false)).get
    val c = Multimodal.frameHashesAvi(
      Multimodal.syntheticAviKeyed(2L, 10, 6, 3, perturb = true)).get
    a shouldBe b
    a.tail shouldBe c.tail // frames 1.. are untouched by the perturbation
    // deterministic integer math — pinned exactly (this seed's frame 0
    // lands just past maxHamming 3, so its PAIR survives on the
    // untouched frames alone: the matched-slot design point)
    java.lang.Long.bitCount(a.head ^ c.head) shouldBe 4
  }

  test("frameHashesAvi rejects non-AVI, other-RIFF, and truncated payloads") {
    Multimodal.frameHashesAvi("not a video at all".getBytes) shouldBe None
    // RIFF but WAVE: the audio container must not parse as video
    Multimodal.frameHashesAvi(
      Multimodal.syntheticWavKeyed(1L, 64, perturb = false)) shouldBe None
    val valid = Multimodal.syntheticAviKeyed(3L, 8, 4, 2, perturb = false)
    Multimodal.frameHashesAvi(valid.take(valid.length - 10)) shouldBe None
  }

  test("non-AVI payloads fall back to one frame-0 xxhash64 row (seed 42)") {
    import spark.implicits._
    val payload = "definitely not a video".getBytes
    val rows = Multimodal.videoFrameHashes(
        Seq(MediaRecord(7L, "text", payload)).toDS())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val expected = Seq(Tuple1(payload)).toDF("p")
      .select(xxhash64(col("p"))).head().getLong(0)
    rows.toSeq shouldBe Seq((7L, 0, expected))
  }

  test("slot-aligned banded pairs == brute-force per-frame popcount sweep " +
      "over the planted corpus") {
    import spark.implicits._
    val ids = (0L until 100L)
    def hashes(id: Long): Seq[Long] = {
      val seed = id / 2
      Multimodal.frameHashesAvi(Multimodal.syntheticAviKeyed(
        seed, 8 + (seed % 16).toInt, 4 + (seed % 8).toInt,
        2 + (seed % 3).toInt, perturb = id % 2 == 1)).get
    }
    val fps = ids.map(id => id -> hashes(id)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      m = fps(a).zip(fps(b))
        .count { case (x, y) => java.lang.Long.bitCount(x ^ y) <= 3 }
      if m >= 2
    } yield (a, b, m.toLong)).toSet

    val got = Multimodal.syntheticAviHashPipeline(
        spark, ids.toDF("doc_id"), "doc_id", maxHamming = 3,
        minMatchedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe expected
    // the seed = id/2 planting yields at least some even/odd near-dups
    // (2-4 aligned frames, only frame 0 perturbed)
    expected.count { case (a, b, _) => b == a + 1 && a % 2 == 0 } should be > 10
  }

  test("the matched-frame gate caps at the pair's own slot count: " +
      "byte-identical unknown formats and 1-frame AVIs still pair") {
    import spark.implicits._
    val junk = "definitely not a video".getBytes
    val oneFrame = Multimodal.syntheticAviKeyed(5L, 8, 4, 1, perturb = false)
    val twoFrame = Multimodal.syntheticAviKeyed(9L, 8, 4, 2, perturb = false)
    val media = Seq(
      MediaRecord(1L, "video", junk),          // fallback: one xxhash64 row
      MediaRecord(2L, "video", junk.clone()),  // byte-identical twin
      MediaRecord(3L, "video", oneFrame),      // real AVI, single frame
      MediaRecord(4L, "video", oneFrame.clone()),
      MediaRecord(5L, "video", twoFrame),      // multi-frame: gate stays 2
      MediaRecord(6L, "video", "other bytes entirely".getBytes)).toDS()
    val pairs = Multimodal.videoHashPairs(media, minMatchedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the default gate of 2 can never be met by 1-slot payloads — the
    // cap admits exactly the identical ones and nothing else; the
    // 2-frame clip has no twin so it pairs with nobody
    pairs shouldBe Set((1L, 2L, 1L), (3L, 4L, 1L))
  }

  test("pipeline is partitioning-invariant") {
    import spark.implicits._
    val ids = (0L until 60L).toDF("doc_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.syntheticAviHashPipeline(spark, df, "doc_id")
        .orderBy("id_a", "id_b").collect().toSeq
    run(ids.repartition(7)) shouldBe run(ids.coalesce(1))
  }
}
