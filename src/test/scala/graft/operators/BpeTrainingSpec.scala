package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.Bpe

/** BPE training: the greedy loop learns the expected merges on crafted
  * corpora, trained tables are well-formed (so they plug into the
  * oracle-replayable encoder), training is deterministic and
  * partitioning-invariant, and encoding under a trained table compresses
  * the corpus it was trained on.
  */
class BpeTrainingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.toSeq.toDF("text")
  }

  test("learns the expected merges on a crafted histogram") {
    // "abab" x3: pairs (a,b)=6, (b,a)=3 -> merge (a,b); then (ab,ab)=3
    val merges = Bpe.trainFromCounts(Seq("abab" -> 3L), nMerges = 5)
    merges shouldBe Vector(("a", "b"), ("ab", "ab"))
  }

  test("ties break deterministically (count desc, then lexicographic)") {
    // (a,b) and (c,d) both count 2 -> (a,b) first
    val merges = Bpe.trainFromCounts(Seq("ab" -> 2L, "cd" -> 2L), nMerges = 2)
    merges shouldBe Vector(("a", "b"), ("c", "d"))
  }

  test("stops below minCount instead of memorizing singletons") {
    Bpe.trainFromCounts(Seq("xy" -> 1L), nMerges = 5) shouldBe empty
    Bpe.trainFromCounts(Seq("xy" -> 1L), nMerges = 5, minCount = 1) shouldBe
      Vector(("x", "y"))
  }

  test("trained tables are well-formed and plug into the encoder") {
    val corpus = docs(
      "the quick brown fox jumps over the lazy dog",
      "the quicker the better said the dog",
      "brown dogs jump over lazy foxes quickly")
    val merges = BpeTraining.train(corpus, "text", nMerges = 20, minCount = 2)
    merges should not be empty
    noException should be thrownBy Bpe.validateWellFormed(merges)
    // encoding under the trained table compresses vs character splitting
    val rank = merges.zipWithIndex.toMap
    val word = "quickly"
    val toks = Bpe.encodeWordWith(word, rank, merges)
    toks.mkString shouldBe word // lossless
    toks.length should be < word.length // and compressive
  }

  test("training is partitioning-invariant") {
    val texts = (0 until 50).map(i =>
      s"alpha beta gamma alpha beta delta run$i")
    val a = BpeTraining.train(docs(texts: _*), "text", nMerges = 10)
    val b = BpeTraining.train(docs(texts: _*).repartition(7), "text",
      nMerges = 10)
    b shouldBe a
  }

  test("word histogram counts under the BPE pre-tokenizer") {
    val hist = BpeTraining.wordHistogram(docs("a-b a a", "b! a"), "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    hist shouldBe Map("a" -> 4L, "b" -> 2L, "-" -> 1L, "!" -> 1L)
  }

  test("maxDistinctWords keeps the heaviest words") {
    val hist = BpeTraining.wordHistogram(
      docs("x x x y y z"), "text", maxDistinctWords = 2)
      .collect().map(_.getString(0))
    hist shouldBe Array("x", "y")
  }
}
