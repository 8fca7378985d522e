package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** WordPiece greedy longest-match segmentation: the BERT all-or-nothing
  * contract against hand-verified cases, reconstruction and counting
  * invariants on the fixture corpus, and knob validation.
  */
class WordPieceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def seg(words: String*): (Seq[String], Long) = {
    import spark.implicits._
    val row = Seq(Tuple1(words)).toDF("w")
      .select(WordPiece.segmentWords(col("w")).as("s"))
      .select(col("s.pieces"), col("s.n_unk_words")).head()
    (row.getSeq[String](0), row.getLong(1))
  }

  test("greedy longest-match: the longest piece wins at every position") {
    // "table" is one piece even though tab+##le also tiles it
    seg("table")._1 shouldBe Seq("table")
    // "tables": longest initial match "table", then continuation "##s"
    seg("tables")._1 shouldBe Seq("table", "##s")
    // "value" -> whole-word piece absent? present: "value"
    seg("value")._1 shouldBe Seq("value")
    // "values" -> "value" + "##s"
    seg("values")._1 shouldBe Seq("value", "##s")
    // "groups" -> "group" + "##s" (not gr+##oup+##s)
    seg("groups")._1 shouldBe Seq("group", "##s")
    // continuation pieces beat char-by-char: "cabin" = c ##a ##b ##in
    seg("cabin")._1 shouldBe Seq("c", "##a", "##b", "##in")
  }

  test("all-or-nothing UNK: an unmatchable interior position collapses " +
      "the whole word, and only that word — neighbors are untouched") {
    // digits exist only word-initially in DefaultVocab
    val (pieces, unk) = seg("a7b", "table")
    pieces shouldBe Seq("[UNK]", "table")
    unk shouldBe 1L
  }

  test("interior digits UNK; word-initial digits segment") {
    seg("a7b") shouldBe (Seq("[UNK]"), 1L)
    seg("7up") shouldBe (Seq("7", "##u", "##p"), 0L)
    seg("x123") shouldBe (Seq("[UNK]"), 1L)
  }

  test("empty word arrays and multi-word ordering") {
    seg()._1 shouldBe Seq.empty
    val (pieces, unk) = seg("the", "fast", "query")
    pieces shouldBe Seq("the", "fast", "query")
    unk shouldBe 0L
  }

  test("fixture corpus invariants: reconstruction, counts, determinism") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val out = WordPiece.segment(docs, "doc_id", "text").cache()
    try {
      out.count() shouldBe docs.count()
      // n_pieces >= n_words - n_unk... every non-UNK word yields >= 1
      // piece and UNK words yield exactly 1
      out.where(col("n_pieces") < col("n_words")).count() shouldBe 0
      // stripping ## and [UNK] reconstructs the words modulo UNK: check
      // on the docs with zero UNK words — the segmentation re-joined
      // without prefixes equals the space-joined word list
      val joined = docs
        .select(col("doc_id"),
          array_join(graft.functions.TextFunctions.words(col("text")), " ")
            .as("orig"))
        .join(out, "doc_id")
        .where(col("n_unk_words") === 0)
        .select(col("orig"),
          regexp_replace(regexp_replace(col("segmentation"), " ##", ""),
            "##", "").as("rebuilt"))
      joined.count() should be > 0L
      joined.where(col("orig") =!= col("rebuilt")).count() shouldBe 0
      // deterministic across evaluations
      val a = out.orderBy("doc_id").collect().map(_.toSeq)
      val b = WordPiece.segment(docs, "doc_id", "text")
        .orderBy("doc_id").collect().map(_.toSeq)
      a shouldBe b
    } finally out.unpersist()
  }

  test("training: the likelihood criterion prefers exclusive pairs over " +
      "frequent-part pairs, merges deterministically, covers singles") {
    // "xy" occurs 5x and x,y occur ONLY together (score 5/(5*5)=0.2);
    // "ab" occurs 10x but a,b are everywhere (a:30, b:30 -> 10/900).
    // Frequency-ranked BPE would merge (a,##b) first; WordPiece must
    // pick (x,##y).
    val counts = Seq(
      "xy" -> 5L, "ab" -> 10L,
      "a" -> 10L, "b" -> 10L, "ba" -> 10L)
    val vocab = WordPiece.trainFromCounts(counts, nMerges = 1)
    vocab should contain("xy")
    (vocab should not).contain("ab")
    // every seen character form is covered
    vocab should contain allOf ("a", "b", "x", "##y", "##b", "##a")
    // determinism
    WordPiece.trainFromCounts(counts, nMerges = 3) shouldBe
      WordPiece.trainFromCounts(counts, nMerges = 3)
  }

  test("a trained vocabulary round-trips its own training corpus with " +
      "zero UNK words and plugs into the segmenter") {
    import spark.implicits._
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").limit(100)
    val vocab = WordPiece.train(docs, "text", nMerges = 50)
    vocab.distinct.size shouldBe vocab.size
    // segment the SAME corpus under the trained vocab: full coverage of
    // seen characters means no word can fail
    val seg = WordPiece.segment(docs, "doc_id", "text", vocab = vocab)
    seg.agg(sum("n_unk_words")).head().getLong(0) shouldBe 0L
    // merges actually compress: fewer pieces than characters
    val words = docs
      .select(explode(graft.functions.TextFunctions.words(col("text")))
        .as("w"))
    val nChars = words
      .agg(sum(org.apache.spark.sql.functions.length(col("w"))))
      .head().getLong(0)
    val nPieces = seg.agg(sum("n_pieces")).head().getLong(0)
    nPieces should be < nChars
  }

  test("property: the expression equals an independent greedy-walk " +
      "transcription (the oracle CTE's strategy) on arbitrary words") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // the oracle's strategy, transcribed directly: at each position take
    // the longest vocabulary match; any dead position collapses the word
    def reference(w: String): (List[String], Boolean) = {
      val vocab = WordPiece.DefaultVocab.toSet
      val maxL = WordPiece.DefaultMaxPieceLen
      var pos = 0
      val acc = scala.collection.mutable.ListBuffer.empty[String]
      while (pos < w.length) {
        val hit = (math.min(maxL, w.length - pos) to 1 by -1).iterator
          .map { l =>
            if (pos == 0) w.substring(0, l)
            else WordPiece.ContPrefix + w.substring(pos, pos + l)
          }.find(vocab.contains)
        hit match {
          case Some(p) =>
            acc += p
            pos += (if (pos == 0) p.length
              else p.length - WordPiece.ContPrefix.length)
          case None => return (List(WordPiece.UnkToken), true)
        }
      }
      (acc.toList, false)
    }
    // piece-rich alphabet so random words actually hit multi-char
    // pieces, plus digits to exercise the UNK collapse
    val charGen: Gen[Char] = Gen.frequency(
      (8, Gen.oneOf("tablevaluegroupdatsrow".toSeq)),
      (2, Gen.alphaLowerChar), (1, Gen.numChar))
    val wordGen: Gen[String] = Gen.chooseNum(1, 16)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val prop = Prop.forAll(Gen.listOfN(6, wordGen)) { ws =>
      val (pieces, unk) = seg(ws: _*)
      val expected = ws.filter(_.nonEmpty).map(reference)
      pieces == expected.flatMap(_._1) &&
        unk == expected.count(_._2).toLong &&
        // reconstruction on the non-UNK prefix-stripped pieces
        expected.filterNot(_._2).map(_._1.map(p =>
          p.stripPrefix(WordPiece.ContPrefix)).mkString).forall { rebuilt =>
          ws.contains(rebuilt)
        }
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(120), prop)
    withClue(res.status) { res.passed shouldBe true }
  }

  test("knob validation fails loud") {
    import spark.implicits._
    val df = Seq(Tuple1(Seq("a"))).toDF("w")
    intercept[Exception] {
      df.select(WordPiece.segmentWords(col("w"), vocab = Seq("a", "a")))
        .collect()
    }
    intercept[Exception] { // unk must not be a piece
      df.select(WordPiece.segmentWords(col("w"),
        vocab = Seq("a", "[UNK]"))).collect()
    }
    intercept[Exception] { // piece body over maxPieceLen
      df.select(WordPiece.segmentWords(col("w"),
        vocab = Seq("abcdefghij"), maxPieceLen = 4)).collect()
    }
  }
}
