package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Edge behavior of the q151/q152 operators: facet distribution over a
  * query's match set ([[TextAnalysis.facetCounts]]) and the
  * retrieve-then-quote snippet slice ([[TextAnalysis.passageSnippets]]).
  * The battery rows pin the happy path against the DuckDB oracle; this
  * suite pins the edges the oracle fixture cannot reach — null facet
  * values, window overrun at the document tail, and term-dedup
  * semantics.
  */
class FacetSnippetSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private def queries(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("query_id", "qterms")
  }

  test("facetCounts: matched docs distribute over the facet; a doc " +
    "counts once per query no matter how many terms it matches") {
    val d = docs(
      (1L, "fast table fast", "en"),   // matches both terms — counts once
      (2L, "a fast horse", "en"),
      (3L, "une table", "fr"),
      (4L, "nothing relevant", "de"))
    val out = TextAnalysis.facetCounts(d, "doc_id", "text",
        queries(1L -> "fast table"), "query_id", "qterms", "lang")
      .orderBy("facet")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out shouldBe Array((1L, "en", 2L), (1L, "fr", 1L))
  }

  test("facetCounts: a null facet value is a real group, not a dropped " +
    "row (unlabeled docs must stay visible in the panel)") {
    import spark.implicits._
    val d = Seq((1L, "fast table", Option("en")),
        (2L, "fast boat", Option.empty[String]))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.facetCounts(d, "doc_id", "text",
        queries(1L -> "fast"), "query_id", "qterms", "lang")
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), r.getLong(2))).toSet
    out shouldBe Set((1L, Some("en"), 1L), (1L, None, 1L))
  }

  test("histogram facet: signed metrics bucket DOWNWARD (floor, not " +
    "truncate-toward-zero) and a null metric stays a visible group — " +
    "the q158 derived-bucket pattern beyond the fixture's positives") {
    import spark.implicits._
    // sentiment-delta-style metric: -50 must land in the -100 bucket
    // (floor(-0.5) = -1); int-division truncation would fold it into
    // bucket 0 and silently merge it with small positives
    val d = Seq((1L, "fast", Some(-50L)), (2L, "fast", Some(149L)),
        (3L, "fast", Some(-100L)), (4L, "fast", Option.empty[Long]),
        (5L, "slow", Some(-999L))) // unmatched: must not surface
      .toDF("doc_id", "text", "delta")
      .withColumn("bucket",
        (floor(col("delta") / 100) * 100).cast("long"))
    val out = TextAnalysis.facetCounts(d, "doc_id", "text",
        queries(1L -> "fast"), "query_id", "qterms", "bucket")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getLong(2))).toSet
    out shouldBe Set((1L, Some(-100L), 2L), (1L, Some(100L), 1L),
      (1L, None, 1L))
  }

  test("facetCounts: repeated query terms add nothing, and a query " +
    "matching no docs yields no rows (not zero-count rows)") {
    val d = docs((1L, "fast table", "en"), (2L, "slow chair", "fr"))
    val out = TextAnalysis.facetCounts(d, "doc_id", "text",
        queries(1L -> "fast fast fast", 2L -> "zebra"),
        "query_id", "qterms", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out shouldBe Array((1L, "en", 1L))
  }

  test("significantTerms: a term concentrated in the match set " +
      "outranks a corpus-wide one; the query's own terms are excluded") {
    val d = docs(
      (1L, "fast rocket engine", "en"),
      (2L, "fast rocket fuel", "en"),
      (3L, "slow common words", "en"),
      (4L, "common words again", "en"))
    // match set of "fast" = docs 1,2; "rocket" is in 2/2 matched vs
    // 2/4 corpus (lift 2); "engine"/"fuel" 1/2 vs 1/4 (lift 2);
    // "common" never co-occurs; "fast" itself is excluded
    val out = TextAnalysis.significantTerms(d, "doc_id", "text",
        { import spark.implicits._; Seq(1L -> "fast").toDF("query_id", "qterms") },
        "query_id", "qterms", k = 10)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getDouble(3)))
      .sortBy(_._1)
    out.map(_._2) should not contain "fast"
    out.map(_._2) should not contain "common"
    // ln(2) lift, ties on term ascending: engine, fuel, rocket
    out.map(_._2) shouldBe Array("engine", "fuel", "rocket")
    all(out.map(_._3)) shouldBe BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("significantTerms: minFgCount drops hapax co-occurrences before " +
      "scoring (the web-scale typo-noise cutoff); 1 keeps everything; " +
      "0 fails loud") {
    val d = docs(
      (1L, "fast rocket engine", "en"),
      (2L, "fast rocket fuel", "en"),
      (3L, "slow common words", "en"),
      (4L, "common words again", "en"))
    import spark.implicits._
    val q = Seq(1L -> "fast").toDF("query_id", "qterms")
    def terms(minFg: Int) = TextAnalysis.significantTerms(d, "doc_id",
        "text", q, "query_id", "qterms", k = 10, minFgCount = minFg)
      .collect().map(_.getString(2)).sorted
    // engine/fuel each co-occur in ONE matched doc; rocket in both
    terms(1) shouldBe Array("engine", "fuel", "rocket")
    terms(2) shouldBe Array("rocket")
    intercept[IllegalArgumentException](terms(0))
  }

  test("significantTerms: zero-match queries yield no rows; repeated " +
      "query terms add nothing") {
    val d = docs((1L, "fast table", "en"), (2L, "slow chair", "en"))
    import spark.implicits._
    val out = TextAnalysis.significantTerms(d, "doc_id", "text",
        Seq(1L -> "zebra", 2L -> "fast fast").toDF("query_id", "qterms"),
        "query_id", "qterms", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    out.map(_._1).distinct shouldBe Array(2L)
    out.map(_._2) shouldBe Array("table") // ln((1/1)/(1/2)) = ln 2 > 0
  }

  test("passageSnippets: the snippet is exactly `window` normalized " +
    "words from the winning start") {
    val d = docs(
      (1L, "aa bb cc dd ee ff gg hh", "en"))
    val out = TextAnalysis.passageSnippets(d, "doc_id", "text",
        queries(1L -> "cc dd"), "query_id", "qterms", window = 3, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    // best window covering cc(2) dd(3) starts at 2; slice is 3 words
    out shouldBe Array((1L, 1L, 1L, 2L, 2L, "cc dd ee"))
  }

  test("passageSnippets: a window overrunning the document tail clamps " +
    "to the words that exist instead of crashing or padding") {
    val d = docs((1L, "aa bb target", "en"))
    val out = TextAnalysis.passageSnippets(d, "doc_id", "text",
        queries(1L -> "target"), "query_id", "qterms", window = 8, k = 5)
      .collect().map(r => (r.getLong(4), r.getString(5)))
    // the hit is the final word: start=2, only one word remains
    out shouldBe Array((2L, "target"))
  }

  test("passageSnippets: snippet text is the NORMALIZED token stream " +
    "(the positions index normalized words, so the slice must too)") {
    val d = docs((1L, "The QUICK, brown fox!", "en"))
    val out = TextAnalysis.passageSnippets(d, "doc_id", "text",
        queries(1L -> "quick brown"), "query_id", "qterms",
        window = 2, k = 5)
      .collect().map(_.getString(5))
    out shouldBe Array("quick brown")
  }

  test("passageSnippets: repeated query terms do not double-count hits " +
    "(same ranking as the deduped query)") {
    val d = docs(
      (1L, "table x y z table", "en"),
      (2L, "table table table q", "en"))
    def run(terms: String) =
      TextAnalysis.passageSnippets(d, "doc_id", "text",
          queries(1L -> terms), "query_id", "qterms", window = 4, k = 5)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    run("table table") shouldBe run("table")
    // doc 2 packs 3 occurrences into one window and must outrank doc 1
    run("table").head shouldBe ((1L, 2L, 3L))
  }
}
