package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Properties of the winnowing (MOSS) fingerprint scheme. */
class WinnowingSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val k = 3
  private val win = 4

  private def fps(rows: Seq[(Long, String)]): Map[Long, Set[String]] = {
    import spark.implicits._
    TextAnalysis
      .winnowFingerprints(rows.toDF("doc_id", "text"), "doc_id", "text", k, win)
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, fs) => id -> fs.map(_._2).toSet }
  }

  test("guarantee: a shared run of >= win+k-1 words yields a common fingerprint") {
    // Two documents with disjoint vocabulary except a planted 6-word
    // (= win+k-1) run — the winnowing guarantee says they MUST share
    // at least one fingerprint.
    val shared = "quick brown foxes jump over fences"
    val a = s"alpha beta gamma delta $shared epsilon zeta"
    val b = s"one two three $shared four five six seven"
    val m = fps(Seq(1L -> a, 2L -> b))
    (m(1L) intersect m(2L)) should not be empty
  }

  test("fingerprints are a subset of the doc's own gram hashes and ~1/win dense") {
    val text = (1 to 200).map(i => s"w$i").mkString(" ") // 200 distinct words
    val m = fps(Seq(1L -> text))
    val nGrams = 200 - (k - 1)
    // every window min is one of the gram hashes; distinct count is bounded
    // by window count and, for distinct-ish hashes, lands well under it
    m(1L).size should be <= (nGrams - (win - 1))
    // density: expected ~ 2/(win+1) of grams survive; allow a wide band
    m(1L).size should be >= nGrams / (win * 3)
  }

  test("documents shorter than win+k-1 words produce no fingerprints") {
    val m = fps(Seq(1L -> "only five words right here"))
    m.get(1L) shouldBe None
  }

  test("deterministic across evaluations") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    fps(Seq(1L -> text)) shouldBe fps(Seq(1L -> text))
  }

  test("property: imperative expression equals the declarative HOF twin " +
      "(values AND per-doc order)") {
    import spark.implicits._
    val word = Gen.oneOf((1 to 30).map(i => s"t$i"))
    val doc = Gen.choose(6, 60).flatMap(n => Gen.listOfN(n, word))
    val docs = Gen.listOfN(6, doc)
    val prop = Prop.forAll(docs) { ds =>
      val df = ds.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val fast = TextAnalysis.winnowFingerprints(df, "doc_id", "text", k, win)
        .as[(Long, String)].collect().toSeq
      val slow = TextAnalysis.winnowFingerprintsHof(df, "doc_id", "text", k, win)
        .as[(Long, String)].collect().toSeq
      fast == slow
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    withClue(res.status.toString)(res.passed shouldBe true)
  }
}
