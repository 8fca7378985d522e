package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property tests pinning each optimized custom expression to its
  * composable (slower) twin — the invariants that let the hot paths be
  * rewritten without semantic drift.
  */
class ExpressionPropertiesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val wordGen: Gen[String] = Gen.chooseNum(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val wordsGen: Gen[List[String]] = Gen.choose(0, 30)
    .flatMap(n => Gen.listOfN(n, wordGen))

  private def check(prop: Prop, n: Int = 30): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(result.passed, result.status.toString)
  }

  test("WordShingles == array_distinct(transform(sequence(...))) on random inputs") {
    import spark.implicits._
    check(Prop.forAll(wordsGen) { ws =>
      ws.length < 3 || {
        val df = Seq(Tuple1(ws)).toDF("w")
        val fast = df.select(TextFunctions.wordShingles(col("w"), 3).as("sh"))
          .head().getSeq[String](0)
        val slow = df.select(array_distinct(transform(
            sequence(lit(0), org.apache.spark.sql.functions.size(col("w")) - 3),
            i => concat_ws(" ", element_at(col("w"), i + 1),
              element_at(col("w"), i + 2), element_at(col("w"), i + 3)))).as("sh"))
          .head().getSeq[String](0)
        fast == slow
      }
    })
  }

  test("md5Long matches MessageDigest reference bytes") {
    import org.apache.spark.unsafe.types.UTF8String
    check(Prop.forAll(wordGen) { s =>
      val viaHelper = HashFamilies.md5Long(UTF8String.fromString(s))
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val viaRef = java.nio.ByteBuffer.wrap(digest).getLong
      viaHelper == viaRef
    })
  }

  test("hyperplane_buckets table 0 == composed lshBucket with the same planes") {
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 6
    check(Prop.forAll(Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))) { vec =>
      val df = Seq(Tuple1(vec.toArray)).toDF("emb")
      val planes = Similarity.hyperplanes(4, dim, seed = 11L)
      val composed = df.select(Similarity.lshBucket(col("emb"), planes).as("b"))
        .head().getInt(0)
      val fused = df.select(element_at(
          GraftFunctions.hyperplane_buckets(col("emb"), 1, 4, dim), 1).as("b"))
        .head().getInt(0)
      composed == fused
    }, n = 15)
  }

  test("minhash signatures: deterministic, k-length, permutation-bound") {
    import spark.implicits._
    check(Prop.forAll(wordsGen) { ws =>
      ws.isEmpty || {
        val df = Seq(Tuple1(ws)).toDF("w")
        val sig1 = df.select(GraftFunctions.minhash(col("w"), 8, 7L).as("s"))
          .head().getSeq[Long](0)
        val sig2 = df.select(GraftFunctions.minhash(col("w"), 8, 7L).as("s"))
          .head().getSeq[Long](0)
        sig1 == sig2 && sig1.length == 8 &&
          sig1.forall(v => v >= 0 && v < HashFamilies.Prime)
      }
    }, n = 20)
  }

  test("minhash of a superset never exceeds the subset's minimums") {
    import spark.implicits._
    // adding shingles can only LOWER each signature slot (min over more)
    check(Prop.forAll(wordsGen.suchThat(_.nonEmpty), wordsGen) { (a, extra) =>
      val df = Seq((a, a ++ extra)).toDF("small", "big")
      val sSmall = df.select(GraftFunctions.minhash(col("small"), 8, 7L)).head().getSeq[Long](0)
      val sBig = df.select(GraftFunctions.minhash(col("big"), 8, 7L)).head().getSeq[Long](0)
      sSmall.zip(sBig).forall { case (sm, bg) => bg <= sm }
    }, n = 20)
  }

  test("cosine_sim is symmetric and 1.0 on self") {
    import spark.implicits._
    val vecGen = Gen.listOfN(5, Gen.chooseNum(-3.0, 3.0)).suchThat(_.exists(_ != 0.0))
    check(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val ab = df.select(GraftFunctions.cosine_sim(col("a"), col("b"))).head().getDouble(0)
      val ba = df.select(GraftFunctions.cosine_sim(col("b"), col("a"))).head().getDouble(0)
      val aa = df.select(GraftFunctions.cosine_sim(col("a"), col("a"))).head().getDouble(0)
      ab == ba && math.abs(aa - 1.0) < 1e-9 && ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9
    }, n = 20)
  }
}
