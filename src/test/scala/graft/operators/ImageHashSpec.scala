package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Perceptual image hashing (aHash) + Hamming near-dup pairs: the hash is
  * pinned on a hand-computed BMP, the banded pair join is checked against
  * a brute-force popcount sweep (pigeonhole recall is exact for Hamming
  * <= 3), the non-BMP fallback is xxhash64-exact, and the battery
  * pipeline is partitioning-invariant.
  */
class ImageHashSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** 8x8 24bpp bottom-up BMP, all black except pixel (0,0) = white. */
  private def onePixelBmp: Array[Byte] = {
    val stride = (8 * 3 + 3) & ~3 // 24
    val buf = ByteBuffer.allocate(54 + stride * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + stride * 8).putInt(0).putInt(54)
    buf.putInt(40).putInt(8).putInt(8)
    buf.putShort(1.toShort).putShort(24.toShort)
    buf.putInt(0).putInt(stride * 8)
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put(54, 255.toByte); buf.put(55, 255.toByte); buf.put(56, 255.toByte)
    buf.array()
  }

  test("aHash of a hand-computed image: one bright cell -> exactly bit 0") {
    // 8x8 image, cell (i,j) samples pixel (i,j) exactly; gray(0,0)=255,
    // all other cells 0, sum=255. Bit idx: gray*64 > 255 only at idx 0.
    Multimodal.ahashBmp(onePixelBmp) shouldBe Some(1L)
  }

  test("aHash rejects non-BMP and truncated payloads") {
    Multimodal.ahashBmp("not a bitmap".getBytes) shouldBe None
    Multimodal.ahashBmp(onePixelBmp.take(53)) shouldBe None
  }

  test("equal seeds hash identically; a one-pixel perturbation flips few bits") {
    // seed 2 -> w=10, h=6; the (0,0) channel shift lands at Hamming 2
    // (deterministic integer math — pinned exactly)
    val a = Multimodal.ahashBmp(Multimodal.syntheticBmpKeyed(2L, 10, 6, perturb = false)).get
    val b = Multimodal.ahashBmp(Multimodal.syntheticBmpKeyed(2L, 10, 6, perturb = false)).get
    val c = Multimodal.ahashBmp(Multimodal.syntheticBmpKeyed(2L, 10, 6, perturb = true)).get
    a shouldBe b
    java.lang.Long.bitCount(a ^ c) shouldBe 2
  }

  test("non-BMP payloads fall back to xxhash64 of the raw bytes (seed 42)") {
    import spark.implicits._
    val payload = "definitely not an image".getBytes
    val fp = Multimodal.imageHash(
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
      Multimodal.syntheticBmpKeyed(seed, 8 + (seed % 32).toInt,
        4 + (seed % 16).toInt, perturb = id % 2 == 1)
    }
    val fps = ids.map(id => id -> Multimodal.ahashBmp(payload(id)).get).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h)).toSet

    val got = Multimodal.syntheticBmpHashPipeline(
        spark, ids.toDF("doc_id"), "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    got shouldBe expected
    // the seed = id/2 planting yields at least some even/odd near-dups
    expected.count { case (a, b, _) => b == a + 1 && a % 2 == 0 } should be > 10
  }

  test("pipeline is partitioning-invariant") {
    import spark.implicits._
    val ids = (0L until 60L).toDF("doc_id")
    def run(df: org.apache.spark.sql.DataFrame) =
      Multimodal.syntheticBmpHashPipeline(spark, df, "doc_id")
        .orderBy("id_a", "id_b").collect().toSeq
    run(ids.repartition(7)) shouldBe run(ids.coalesce(1))
  }
}
