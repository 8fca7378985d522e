package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** C4 line-level cleaning: each rule drops exactly its planted line,
  * order is preserved, flags fire on the original text, and empty
  * results surface rather than dropping.
  */
class LinesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def run(text: String) = {
    import spark.implicits._
    Lines.c4LineFilter(Seq((1L, text)).toDF("id", "txt"), "id", "txt")
      .head()
  }

  test("per-line rules: terminal punctuation, word floor, javascript; " +
      "order preserved; flags fire on the ORIGINAL text") {
    val r = run(Seq(
      "A good first sentence here.",   // keep
      "no terminal punctuation line",  // drop: no . ! ? "
      "Too short.",                    // drop: 2 words
      "Please enable JavaScript to continue.", // drop: javascript
      "He said \"stop now.\"",         // keep: close-quote after terminator
      "Is this kept as well?",         // keep: ? terminates
      "function() { return 1; }"       // drop: no terminal punct; flags brace
    ).mkString("\n"))
    r.getAs[Long]("n_lines") shouldBe 7L
    r.getAs[Long]("n_kept") shouldBe 3L
    r.getAs[String]("text") shouldBe Seq(
      "A good first sentence here.",
      "He said \"stop now.\"",
      "Is this kept as well?").mkString("\n")
    r.getAs[Boolean]("has_brace") shouldBe true
    r.getAs[Boolean]("has_lorem") shouldBe false
  }

  test("lorem flag, all-dropped docs surface empty, and the word floor " +
      "is configurable") {
    import spark.implicits._
    val r = run("Lorem Ipsum dolor sit amet.")
    r.getAs[Boolean]("has_lorem") shouldBe true
    r.getAs[Long]("n_kept") shouldBe 1L // flag is doc-level, line passes
    val empty = run("menu\nhome\nabout")
    empty.getAs[Long]("n_kept") shouldBe 0L
    empty.getAs[String]("text") shouldBe ""
    // floor = 1: the two-word line now passes
    Lines.c4LineFilter(Seq((1L, "Too short.")).toDF("id", "txt"),
        "id", "txt", minLineWords = 1)
      .head().getAs[Long]("n_kept") shouldBe 1L
  }
}
