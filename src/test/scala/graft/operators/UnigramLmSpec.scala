package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Unigram-LM tokenization: Viterbi picks the max-score split with ties
  * to the longest piece, UNK covers unknown chars, the EM fit's corpus
  * likelihood is non-decreasing (the EM guarantee) and its model
  * actually compresses vs the char baseline, and the fertility frame
  * lines the family up against BPE.
  */
class UnigramLmSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def seg(text: String, vocab: Seq[(String, Long)],
      unk: Long = UnigramLm.DefaultUnkMicros): (Seq[String], Long) = {
    import spark.implicits._
    val r = Seq(Tuple1(text)).toDF("t")
      .select(UnigramLm.segmentWords(
        graft.functions.TextFunctions.words(col("t")), vocab, unk).as("s"))
      .select(col("s.pieces"), col("s.score_micros")).collect()(0)
    (r.getSeq[String](0), r.getLong(1))
  }

  private def m(lp: Double): Long = UnigramLm.micros(lp)

  test("viterbi picks the max-score segmentation") {
    val v = Seq("a" -> m(-1.0), "b" -> m(-1.0), "ab" -> m(-1.5))
    seg("ab", v) shouldBe (Seq("ab"), m(-1.5))
    // a+b (-2.0) beats ab (-2.5)
    val v2 = Seq("a" -> m(-1.0), "b" -> m(-1.0), "ab" -> m(-2.5))
    seg("ab", v2) shouldBe (Seq("a", "b"), m(-2.0))
  }

  test("score ties keep the longest piece (smallest start)") {
    val v = Seq("a" -> m(-1.0), "b" -> m(-1.0), "ab" -> m(-2.0))
    seg("ab", v) shouldBe (Seq("ab"), m(-2.0))
  }

  test("positions no piece ends at fall back to single-char UNK") {
    val v = Seq("a" -> m(-1.0))
    val (pieces, score) = seg("axa", v, unk = m(-9.0))
    pieces shouldBe Seq("a", "x", "a")
    score shouldBe m(-1.0) + m(-9.0) + m(-1.0)
  }

  test("default vocab composes subwords as designed") {
    val (pieces, _) = seg("customer window group value", UnigramLm.DefaultVocab)
    pieces shouldBe Seq("cust", "om", "er", "wind", "ow", "group", "value")
  }

  test("segment() accounting is consistent per document") {
    import spark.implicits._
    val out = UnigramLm.segment(
      Seq((1L, "the table scan"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    out(0).getAs[Long]("n_words") shouldBe 3L
    out(0).getAs[Long]("n_pieces") shouldBe 3L
    out(0).getAs[String]("segmentation") shouldBe "the table scan"
    out(0).getAs[Long]("score_micros") shouldBe
      m(-2.5) + m(-3.0) + m(-3.6)
    out(1).getAs[Long]("n_words") shouldBe 0L
    out(1).getAs[Long]("n_pieces") shouldBe 0L
  }

  test("EM corpus likelihood is non-decreasing round over round") {
    val hist = Seq("table" -> 30L, "tables" -> 10L, "stable" -> 8L,
      "data" -> 25L, "database" -> 9L, "base" -> 7L, "scan" -> 12L)
    val (_, lls) = UnigramLm.emFitWithLL(hist, vocabSize = 40, iters = 4)
    lls.sliding(2).foreach { case Seq(a, b) =>
      b should be >= (a - 1e-6)
    case _ => }
  }

  test("EM keeps every single char, learns multi-char pieces, and its " +
      "model beats the char baseline on its own corpus") {
    val hist = Seq("table" -> 30L, "tables" -> 10L, "stable" -> 8L,
      "data" -> 25L, "database" -> 9L, "scan" -> 12L)
    val model = UnigramLm.emFit(hist, vocabSize = 20, iters = 5)
    val pieces = model.map(_._1).toSet
    hist.flatMap(_._1.toSeq).map(_.toString).toSet.subsetOf(pieces) shouldBe true
    model.map(_._1).exists(_.length > 1) shouldBe true
    // deterministic
    UnigramLm.emFit(hist, vocabSize = 20, iters = 5) shouldBe model
    // Viterbi under the trained model uses fewer pieces than chars
    val dbl = model.map { case (p, mu) => p -> (mu / 1e6) }.toMap
    val charsOnly = model.filter(_._1.length == 1)
    import spark.implicits._
    val corpus = Seq(Tuple1(hist.map(h => (h._1 + " ") * 3).mkString(" "))).toDF("t")
    def pieceCount(v: Seq[(String, Long)]): Long = {
      val segCol: org.apache.spark.sql.Column =
        UnigramLm.segmentWords(
          graft.functions.TextFunctions.words(col("t")), vocab = v)
      corpus.select(
          org.apache.spark.sql.functions.size(segCol.getField("pieces")))
        .collect()(0).getInt(0).toLong
    }
    pieceCount(model) should be < pieceCount(charsOnly)
    dbl.values.foreach(_ should be < 0.0)
  }

  test("fertility frame lines unigram up against BPE per group") {
    import spark.implicits._
    val docs = Seq(("en", "the table scan the table"),
      ("de", "window window group")).toDF("lang", "text")
    val out = UnigramLm.fertilityVsBpe(docs, "lang", "text")
      .orderBy("lang").collect()
    val en = out.find(_.getString(0) == "en").get
    en.getAs[Long]("ws_tokens") shouldBe 5L
    en.getAs[Long]("unigram_pieces") shouldBe 5L // all whole-word pieces
    en.getAs[Double]("unigram_fertility") shouldBe 1.0
    val de = out.find(_.getString(0) == "de").get
    de.getAs[Long]("unigram_pieces") shouldBe 5L // wind ow ×2 + group
  }

  test("encodeIds: vocabIndex+2 ids, UNK=1 for fallback chars, " +
      "truncate then zero-pad to maxLen") {
    import spark.implicits._
    def ids(text: String, maxLen: Int): Seq[Long] =
      UnigramLm.encodeIds(Seq((1L, text)).toDF("id", "t"), "id", "t",
          maxLen)
        .head().getSeq[Long](1)
    // DefaultVocab: 'a' is index 0 -> id 2, 'the' is the 37th entry
    val theId = UnigramLm.DefaultVocab.indexWhere(_._1 == "the") + 2L
    ids("the a", 4) shouldBe Seq(theId, 2L, 0L, 0L)   // pad
    ids("the a", 1) shouldBe Seq(theId)               // truncate
    // '0'..'9' are in-vocab chars; a char OUTSIDE the vocab falls back
    // to a single-char UNK piece -> id 1 (words() keeps digits, drops
    // punctuation, so use a letterlike unknown: words are lowercased
    // a-z0-9 only, every char is in vocab -- force UNK via a vocab
    // without 'q'
    val noQ = UnigramLm.DefaultVocab.filterNot(_._1 == "q")
    UnigramLm.encodeIds(Seq((1L, "q")).toDF("id", "t"), "id", "t", 2,
        vocab = noQ)
      .head().getSeq[Long](1) shouldBe Seq(1L, 0L)
    // empty text -> all PAD
    ids("", 3) shouldBe Seq(0L, 0L, 0L)
  }
}
