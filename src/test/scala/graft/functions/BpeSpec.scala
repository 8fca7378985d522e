package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins the merges-table BPE tokenizer ([[Bpe]]) to its specification:
  *
  *   - min-rank greedy (the engine's inference loop) equals IN-RANK-ORDER
  *     exhaustive replay (what the DuckDB oracle's recursive CTE runs) on
  *     arbitrary inputs — the equivalence the well-formed-table invariant
  *     buys, property-checked rather than trusted;
  *   - concatenation additivity across a whitespace boundary (the
  *     pre-tokenizer never merges across whitespace), so corpus token
  *     budgets are sums of document budgets;
  *   - count == tokens().length, and hand-checked merges.
  */
class BpeSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** The oracle's strategy: apply each merge in rank order, leftmost
    * non-overlapping pass repeated to fixpoint, before moving to the next
    * rank — a direct Scala transcription of the SQL `replace()` loop.
    */
  private def inOrderEncode(word: String): List[String] = {
    var toks: List[String] = word.map(_.toString).toList
    Bpe.Merges.foreach { case (l, r) =>
      var changed = true
      while (changed) {
        changed = false
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = toks
        while (rest.nonEmpty) {
          rest match {
            case a :: b :: tl if a == l && b == r =>
              out += (l + r); rest = tl; changed = true
            case a :: tl => out += a; rest = tl
            case Nil =>
          }
        }
        toks = out.toList
      }
    }
    toks
  }

  // merge-rich alphabet: heavy on the table's letters so random words
  // actually exercise multi-level merges (pure uniform a-z rarely would)
  private val bpeCharGen: Gen[Char] = Gen.frequency(
    (8, Gen.oneOf("theringsoucandmlp".toSeq)),
    (2, Gen.alphaLowerChar), (1, Gen.alphaUpperChar), (1, Gen.numChar))
  private val wordGen: Gen[String] = Gen.chooseNum(1, 14)
    .flatMap(n => Gen.listOfN(n, bpeCharGen).map(_.mkString))
  private val textGen: Gen[String] = Gen.choose(0, 12)
    .flatMap(n => Gen.listOfN(n,
      Gen.oneOf(wordGen, Gen.oneOf(".", ",", "!", "42", "100"))))
    .map(_.mkString(" "))

  private def check(prop: Prop, n: Int = 100): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(result.passed, result.status.toString)
  }

  test("min-rank greedy == in-rank-order exhaustive replay (the oracle equivalence)") {
    check(Prop.forAll(wordGen) { w =>
      Bpe.encodeWord(w).toList == inOrderEncode(w)
    }, n = 300)
  }

  test("tokens re-concatenate to the pre-tokens (lossless segmentation)") {
    check(Prop.forAll(textGen) { text =>
      val m = Bpe.TokenPattern.matcher(text)
      val pre = new StringBuilder
      while (m.find()) pre.append(m.group())
      Bpe.tokens(text).mkString == pre.toString
    })
  }

  test("concatenation additivity across whitespace") {
    check(Prop.forAll(textGen, textGen) { (a, b) =>
      Bpe.countTokens(a + " " + b, null) ==
        Bpe.countTokens(a, null) + Bpe.countTokens(b, null)
    })
  }

  test("countTokens == tokens().length, cached or not") {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    check(Prop.forAll(textGen) { text =>
      val n = Bpe.tokens(text).length.toLong
      Bpe.countTokens(text, null) == n && Bpe.countTokens(text, cache) == n
    })
  }

  test("encodeIds: vocab mapping, truncation, padding, UNK") {
    // "the 42 cats!" tokens: the, 4, 2, c, at, s, !
    def id(tok: String): Int = Bpe.Vocab.indexOf(tok) + 2
    val expect = Seq("the", "4", "2", "c", "at", "s", "!").map(id)
    Bpe.encodeIds("the 42 cats!", 10).toSeq shouldBe (expect ++ Seq(0, 0, 0))
    // truncation keeps the prefix
    Bpe.encodeIds("the 42 cats!", 3).toSeq shouldBe expect.take(3)
    // out-of-vocabulary (non-ASCII) maps to UNK = 1, never throws
    Bpe.encodeIds("é", 2).toSeq shouldBe Seq(1, 0)
    // empty text is all padding
    Bpe.encodeIds("", 4).toSeq shouldBe Seq(0, 0, 0, 0)
    // length is always exactly maxLen, and a larger budget's prefix is
    // the smaller budget's whole output (truncation = prefix)
    check(Prop.forAll(textGen) { t =>
      val a = Bpe.encodeIds(t, 8); val b = Bpe.encodeIds(t, 16)
      a.length == 8 && b.length == 16 && b.take(8).sameElements(a)
    })
    // the unpadded form is encodeIds without the truncate/pad, and its
    // length is the token count
    check(Prop.forAll(textGen) { t =>
      val all = Bpe.encodeIdsAll(t)
      all.length == Bpe.tokens(t).length &&
        Bpe.encodeIds(t, math.max(1, all.length))
          .take(all.length).sameElements(all)
    })
  }

  test("hand-checked merges") {
    Bpe.encodeWord("the").toSeq shouldBe Seq("the")
    Bpe.encodeWord("theater").toSeq shouldBe Seq("the", "at", "er")
    Bpe.encodeWord("ing").toSeq shouldBe Seq("ing")
    Bpe.encodeWord("nation").toSeq shouldBe Seq("n", "ation")
    Bpe.encodeWord("xyz").toSeq shouldBe Seq("x", "y", "z")
    Bpe.encodeWord("Q").toSeq shouldBe Seq("Q")
    Bpe.tokens("the 42 cats!").toSeq shouldBe
      Seq("the", "4", "2", "c", "at", "s", "!")
    Bpe.countTokens("", null) shouldBe 0L
    Bpe.countTokens("   ", null) shouldBe 0L
  }

  test("validateWellFormed rejects duplicate merge outputs (ambiguous decode)") {
    // (a,bc) and (ab,c) both output "abc": the earlier id would be
    // unassignable and id->token decode ambiguous
    val e = intercept[IllegalArgumentException] {
      Bpe.validateWellFormed(Seq(("b", "c"), ("a", "b"),
        ("a", "bc"), ("ab", "c")))
    }
    e.getMessage should include("duplicates an earlier merge")
    // and the embedded vocab is duplicate-free end to end
    Bpe.Vocab.distinct.size shouldBe Bpe.Vocab.size
  }

  test("SQL-callable and count agrees with the sequence on the fixture") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.createOrReplaceTempView("bpe_docs")
    val viaSql = spark.sql(
      "SELECT sum(bpe_token_count(text)) FROM bpe_docs").head().getLong(0)
    val viaSeq = docs
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          GraftFunctions.bpe_tokens(col("text")))).cast("long"))
      .head().getLong(0)
    viaSql shouldBe viaSeq
    viaSql should be > 0L
  }
}
