package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Token chunking: window placement, overlap, tail handling, coverage
  * (every token appears in some chunk), and parameter validation.
  */
class ChunkingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
  }

  private def chunksOf(text: String, size: Int, stride: Int) =
    Chunking.chunk(docs(text), "id", "txt", size, stride)
      .orderBy(col("chunk_id")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))

  test("overlapping windows with a short tail") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = chunksOf(text, size = 4, stride = 2)
    out shouldBe Array(
      (0L, 4L, "t1 t2 t3 t4"),
      (1L, 4L, "t3 t4 t5 t6"),
      (2L, 4L, "t5 t6 t7 t8"),
      (3L, 4L, "t7 t8 t9 t10"),
      (4L, 2L, "t9 t10"))
  }

  test("stride == size gives disjoint full coverage") {
    val text = (1 to 9).map(i => s"t$i").mkString(" ")
    val out = chunksOf(text, size = 3, stride = 3)
    out.map(_._3).mkString(" ") shouldBe text
    out.map(_._2).sum shouldBe 9L
  }

  test("document shorter than one window emits a single chunk") {
    chunksOf("a b", size = 24, stride = 16) shouldBe Array((0L, 2L, "a b"))
  }

  test("empty and whitespace-only documents emit nothing") {
    Chunking.chunk(docs("", "   ", "x"), "id", "txt", 4, 2).count() shouldBe 1L
  }

  test("every token is covered and chunk ids are contiguous per doc") {
    val text = (1 to 50).map(i => s"w$i").mkString(" ")
    val out = chunksOf(text, size = 8, stride = 5)
    out.map(_._1) shouldBe (0L until out.length.toLong).toArray
    out.flatMap(_._3.split(" ")).toSet shouldBe
      (1 to 50).map(i => s"w$i").toSet
  }

  test("stride greater than size is rejected (it would drop tokens)") {
    an[IllegalArgumentException] should be thrownBy
      Chunking.chunk(docs("a"), "id", "txt", size = 4, stride = 5)
  }
}
