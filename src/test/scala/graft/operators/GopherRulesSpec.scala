package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The Gopher rule battery on planted fixtures that exercise every
  * rule — including the line-based ones the flat test corpus cannot.
  */
class GopherRulesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def rules(text: String) = {
    import spark.implicits._
    TextAnalysis.gopherRules(Seq((1L, text)).toDF("id", "txt"),
      "id", "txt").head()
  }

  // 60 words, mean length > 3, two stopwords, no symbols/bullets
  private val goodText = (("the quick brown alpha beta gamma delta " +
    "epsilon zeta eta with ") * 6).trim

  test("a well-formed document passes every gate") {
    val r = rules(goodText)
    r.getAs[Long]("n_words") shouldBe 66L
    r.getAs[Long]("n_stopwords") shouldBe 2L
    r.getAs[Double]("alpha_ratio") shouldBe 1.0
    r.getAs[Boolean]("pass") shouldBe true
  }

  test("bullet-dominated and ellipsis-dominated layouts fail their " +
      "line-ratio gates") {
    val bullets = (1 to 19).map(i => s"- item $i").mkString("\n") +
      "\n" + goodText
    val rb = rules(bullets)
    rb.getAs[Double]("bullet_ratio") shouldBe 0.95
    rb.getAs[Boolean]("pass") shouldBe false
    val ellip = (1 to 4).map(i => s"teaser number $i...").mkString("\n") +
      "\n" + goodText
    val re = rules(ellip)
    re.getAs[Double]("ellipsis_ratio") shouldBe 0.8
    re.getAs[Boolean]("pass") shouldBe false
  }

  test("symbol-heavy text fails the symbol gate; word-count and " +
      "stopword floors gate short/soup text") {
    val r = rules(goodText + " " + ("#tag " * 12).trim)
    r.getAs[Double]("symbol_ratio") should be > 0.1
    r.getAs[Boolean]("pass") shouldBe false
    rules("short text with the and of").getAs[Boolean]("pass") shouldBe
      false // < 50 words
    val soup = ("zz qq ww ee rr tt yy uu ii oo " * 6).trim
    val rs = rules(soup)
    rs.getAs[Long]("n_stopwords") shouldBe 0L
    rs.getAs[Boolean]("pass") shouldBe false
  }

  test("an empty document fails with NULL word metrics, not an error") {
    val r = rules("")
    r.getAs[Long]("n_words") shouldBe 0L
    r.isNullAt(r.fieldIndex("mean_word_len")) shouldBe true
    r.getAs[Boolean]("pass") shouldBe false
  }
}
