package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sentence segmentation: boundary runs, abbreviation protection,
  * terminator retention, id numbering, and degenerate inputs.
  */
class SentencesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "txt")
  }

  private def sents(text: String): Seq[String] =
    Sentences.split(docs(text), "id", "txt")
      .orderBy(col("sent_id")).collect().map(_.getString(2)).toSeq

  test("splits at terminators and keeps the terminator with its " +
      "sentence") {
    sents("One two. Three four! Five six?") shouldBe
      Seq("One two.", "Three four!", "Five six?")
  }

  test("known abbreviations do not end a sentence") {
    sents("Dr. Smith met Mr. Jones. They left. See Fig. 3 now!") shouldBe
      Seq("Dr. Smith met Mr. Jones.", "They left.", "See Fig. 3 now!")
  }

  test("a terminator RUN (ellipsis, ?!) is one boundary") {
    sents("Wait... what?! Fine.") shouldBe
      Seq("Wait...", "what?!", "Fine.")
  }

  test("no terminator = one sentence; a trailing terminator does not " +
      "create an empty one; blank input yields zero rows") {
    sents("no punctuation at all") shouldBe Seq("no punctuation at all")
    sents("Only one here.") shouldBe Seq("Only one here.")
    Sentences.split(docs(""), "id", "txt").count() shouldBe 0L
  }

  test("exploded rows: 1-based sequential sent_id per document, " +
      "n_chars, and per-doc independence") {
    val out = Sentences.split(docs("A b. C d!", "E f? G."), "id", "txt")
      .orderBy(col("id"), col("sent_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    out shouldBe Array(
      (0L, 1L, "A b.", 4L), (0L, 2L, "C d!", 4L),
      (1L, 1L, "E f?", 4L), (1L, 2L, "G.", 2L))
  }

  test("stripRepeated removes df >= minDf boilerplate from every doc, " +
      "keeps order, surfaces all-boilerplate docs empty") {
    val bp = "Subscribe to our newsletter."
    val out = Sentences.stripRepeated(
        docs(s"Unique alpha. $bp Unique beta.",
          s"$bp Another one here.",
          s"Third doc text. $bp",
          bp),   // entirely boilerplate
        "id", "txt", minDf = 3)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    out shouldBe Array(
      (0L, 3L, 2L, "Unique alpha. Unique beta."),
      (1L, 2L, 1L, "Another one here."),
      (2L, 2L, 1L, "Third doc text."),
      (3L, 1L, 0L, ""))
    // below the floor nothing strips (df counts DISTINCT docs — a
    // within-doc repeat is not corpus boilerplate)
    val within = Sentences.stripRepeated(
      docs(s"$bp $bp Own text here.", "Other doc."), "id", "txt",
      minDf = 3)
    within.orderBy(col("id")).collect()
      .map(_.getLong(2)).toSeq shouldBe Seq(3L, 1L)
    an[IllegalArgumentException] should be thrownBy
      Sentences.stripRepeated(docs("x."), "id", "txt", 1)
    // a document yielding ZERO sentences (empty / whitespace-only text)
    // still surfaces: one row per INPUT doc, (0, 0, "") — not silently
    // dropped by the sentence-frame join
    val zero = Sentences.stripRepeated(
        docs("Real text here.", "", "   "), "id", "txt", minDf = 2)
      .orderBy(col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    zero shouldBe Array(
      (0L, 1L, 1L, "Real text here."),
      (1L, 0L, 0L, ""),
      (2L, 0L, 0L, ""))
  }

  test("conservation property: across generated word/terminator/" +
      "abbreviation mixes, the sentences rejoin to the input text and " +
      "every boundary follows a terminator run") {
    // deterministic pseudo-random corpus: the q171 decoration recipe
    // over varied word shapes, including abbreviations mid-sentence
    val words = Vector("alpha", "Dr.", "beta9", "x", "gamma", "No.",
      "delta", "ee", "Fig.", "zeta")
    val fixtures = (0 until 24).map { d =>
      (0 until 30).map { i =>
        val w = words((d * 13 + i * 7) % words.length)
        (d * 7 + i * 5) % 11 match {
          case 0 => w + "."
          case 1 => w + "!"
          case 2 => w + "..."
          case _ => w
        }
      }.mkString(" ")
    }
    fixtures.foreach { text =>
      val ss = sents(text)
      // conservation: rejoining with single spaces reproduces the text
      ss.mkString(" ") shouldBe text
      // every non-final sentence ends in a terminator run; none ends
      // on a protected abbreviation's dot
      ss.dropRight(1).foreach { s =>
        s should fullyMatch regex "(?s).*[.!?]"
        Sentences.Abbrevs.foreach(a =>
          s should not endWith (a + "."))
      }
    }
  }
}
