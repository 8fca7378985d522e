package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.GraftFunctions.{cosine_int8, cosine_sim, int8_pack}

/** int8 quantization: exact code assignment, pack round-trip, cosine
  * fidelity vs float32, range enforcement, and recall of the quantized
  * top-k against the exact top-k on the real embeddings fixture.
  */
class QuantizationSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val embs = graft.core.Tables.load(spark, sfDir, "embeddings")

  private def vecs(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("id", "emb")
  }

  test("codes are floor(x*scale+0.5) with scale 127/maxabs") {
    val out = Quantization.quantize(
      vecs(Seq((0L, Seq(1.0, -0.5, 0.25)), (1L, Seq(0.0, 0.0)))), "emb")
      .orderBy(col("id")).collect()
    out(0).getAs[Double]("scale") shouldBe 127.0
    out(0).getAs[Seq[Int]]("q") shouldBe Seq(127, -63, 32)
    // zero vector: scale 0, all-zero codes, no divide-by-zero
    out(1).getAs[Double]("scale") shouldBe 0.0
    out(1).getAs[Seq[Int]]("q") shouldBe Seq(0, 0)
  }

  test("NaN element: scale NaN, ALL codes 0, identical across both twins") {
    // a NaN element poisons maxabs -> scale NaN -> every product NaN; the
    // imperative twin's NaN.toInt is 0, and the HOF twin pins the same 0
    // explicitly so parity holds regardless of spark.sql.ansi.enabled
    val df = vecs(Seq((0L, Seq(1.0, Double.NaN, -0.5)), (1L, Seq(0.5, 0.25))))
    Seq(Quantization.quantize(df, "emb"), Quantization.quantizeHof(df, "emb"))
      .foreach { out =>
        val rows = out.orderBy(col("id")).collect()
        rows(0).getAs[Double]("scale").isNaN shouldBe true
        rows(0).getAs[Seq[Int]]("q") shouldBe Seq(0, 0, 0)
        rows(1).getAs[Seq[Int]]("q") shouldBe Seq(127, 64)
      }
  }

  test("imperative Int8Quantize is value-identical to the HOF twin") {
    val imp = Quantization.quantize(embs, "embedding")
      .select(col("vec_id"), col("scale"), col("q"))
    val hof = Quantization.quantizeHof(embs, "embedding")
      .select(col("vec_id"), col("scale"), col("q"))
    imp.exceptAll(hof).count() shouldBe 0L
    hof.exceptAll(imp).count() shouldBe 0L
  }

  test("max-magnitude component always maps to +/-127 (no overflow)") {
    val out = Quantization.quantize(embs, "embedding")
      .select(array_max(transform(col("q"), x => abs(x))).as("m"))
      .agg(min(col("m")), max(col("m"))).head()
    out.getInt(0) shouldBe 127
    out.getInt(1) shouldBe 127
  }

  test("quantized cosine tracks float cosine closely") {
    val packed = Quantization.quantizePacked(embs.limit(50), "embedding")
    val a = packed.select(col("vec_id"), col("embedding").as("ea"), col("qb").as("qa"))
    val b = packed.select(col("vec_id").as("id2"), col("embedding").as("eb"),
      col("qb").as("qb2"))
    val err = a.join(b, col("vec_id") < col("id2"))
      .select(abs(cosine_sim(col("ea"), col("eb")) -
        cosine_int8(col("qa"), col("qb2"))).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    // int8 with per-vector scaling: worst-case cosine error well under 1%
    err should be < 0.01
  }

  test("quantized top-k recall vs exact top-k on the fixture") {
    val k = 10
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val packed = Quantization.quantizePacked(embs, "embedding")
    val quant = Quantization.quantizedTopK(packed, "vec_id", "qb", 0L, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    quant.size shouldBe k
    val recall = (exact & quant).size.toDouble / k
    withClue(s"recall $recall (exact=$exact quant=$quant): ") {
      recall should be >= 0.9
    }
  }

  test("quantized LSH index: same pruning, ~8x smaller, recall holds") {
    import java.nio.file.{Files, Paths}
    def dirBytes(p: String): Long = {
      val root = Paths.get(p)
      val s = Files.walk(root)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }
    val floatIdx = Files.createTempDirectory("graft-lsh-f").toString
    val quantIdx = Files.createTempDirectory("graft-lsh-q").toString
    Similarity.writeLshIndex(embs, "vec_id", "embedding", floatIdx)
    Similarity.writeLshIndexQuantized(embs, "vec_id", "embedding", quantIdx)

    val qv = embs.where(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0).toArray
    val k = 10
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding", 0L, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.lshTopKIndexedQuantized(spark, quantIdx,
      "vec_id", qv, 0L, k).select("vec_id").collect().map(_.getLong(0)).toSet
    val float = Similarity.lshTopKIndexed(spark, floatIdx,
      "vec_id", "embedding", qv, 0L, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet

    // recall vs exact matches the float-index gate, and the two index
    // paths agree closely (int8 cosine error < 0.01)
    (exact & quant).size.toDouble / k should be >= 0.7
    (float & quant).size.toDouble / k should be >= 0.8
    // the quantized index stores 1 byte/dim vs 8: bulk is the vector
    // column, so on-disk size must drop by well over half
    dirBytes(quantIdx).toDouble should be < 0.5 * dirBytes(floatIdx)
  }

  test("quantized IVF index agrees with the float IVF index") {
    import java.nio.file.Files
    val floatIdx = Files.createTempDirectory("graft-ivf-f").toString
    val quantIdx = Files.createTempDirectory("graft-ivf-q").toString
    Similarity.writeIvfIndex(embs, "vec_id", "embedding", floatIdx)
    Similarity.writeIvfIndexQuantized(embs, "vec_id", "embedding", quantIdx)

    val qv = embs.where(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0).toArray
    val k = 10
    val float = Similarity.ivfTopKIndexed(spark, floatIdx, "vec_id",
      "embedding", qv, 0L, k).select("vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.ivfTopKIndexedQuantized(spark, quantIdx,
      "vec_id", qv, 0L, k).select("vec_id").collect().map(_.getLong(0)).toSet
    quant.size shouldBe k
    // same cells probed (same centroids/seed); int8 cosine error < 0.01
    // keeps the candidate ranking nearly identical
    (float & quant).size.toDouble / k should be >= 0.8
  }

  test("int8_pack rejects out-of-range codes instead of clamping") {
    import spark.implicits._
    val bad = Seq((0L, Seq(1, 200))).toDF("id", "q")
    val e = intercept[Exception] {
      bad.select(int8_pack(col("q"))).collect()
    }
    e.getMessage should include("outside [-128, 127]")
  }

  test("cosine_int8 rejects dimension mismatch") {
    import spark.implicits._
    val df = Seq((Seq(1, 2), Seq(1, 2, 3))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(cosine_int8(int8_pack(col("a")), int8_pack(col("b")))).collect()
    }
    e.getMessage should include("dimension mismatch")
  }
}
