package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[Dedup.connectedComponents]] (iterative min-label propagation) checked
  * EXACTLY against a driver-side union-find on the same pair sets — fixture
  * pairs plus random graphs — and the documented containment between the
  * two near-dup strategies (component survivors ⊆ greedy survivors).
  */
class ConnectedComponentsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def viaSpark(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("label propagation equals union-find on the fixture's near-dup pairs") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val pairDf = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.02)
    val pairs = pairDf.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    viaSpark(pairs) shouldBe unionFind(pairs)
  }

  test("property: equals union-find on random graphs (incl. chains and stars)") {
    val graph: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 14)
      m <- Gen.chooseNum(1, 20)
      edges <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    val prop = Prop.forAll(graph) { pairs =>
      pairs.isEmpty || viaSpark(pairs) == unionFind(pairs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("a long chain converges (diameter > one propagation pass)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    viaSpark(chain) shouldBe (0L to 9L).map(_ -> 0L).toMap
  }

  test("driver fast path and forced distributed loop label identically") {
    import spark.implicits._
    // chains, a star, a merge of two components, and a self-contained
    // triangle — shapes where a wrong union order or a missed pointer
    // jump would diverge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 9L), (10L, 11L), (11L, 4L),
      (4L, 9L), (20L, 21L), (21L, 22L), (20L, 22L), (30L, 7L))
    val df = pairs.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.connectedComponents(df, maxDriverEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fast shouldBe dist
    fast shouldBe unionFind(pairs)
    // one edge over the cap abandons the collect: distributed result,
    // same labels
    Dedup.connectedComponents(df, maxDriverEdges = pairs.size - 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap shouldBe fast
  }

  test("semantic dedup keeps one representative per embedding cluster") {
    import spark.implicits._
    // one block: {1,2,3} colinear, {4,5} colinear orthogonal to them,
    // 6 at 45 degrees (cos ~0.707 < 0.9 to both) -> survivors {1,4,6}
    val embs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(0.5f, 0.0f), 0), (4L, Array(0.0f, 1.0f), 0),
      (5L, Array(0.0f, 3.0f), 0), (6L, Array(0.7f, 0.7f), 0)
    ).toDF("vec_id", "embedding", "label")
    Dedup.semanticDedup(embs, "vec_id", "embedding", "label", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(1L, 4L, 6L)
  }

  test("policy semantic dedup keeps the highest-priority cluster member") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val embs = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(0.5f, 0.0f), 0), (4L, Array(0.0f, 1.0f), 0),
      (5L, Array(0.0f, 3.0f), 0), (6L, Array(0.7f, 0.7f), 0)
    ).toDF("vec_id", "embedding", "label")
    // priority = id % 7: cluster {1,2,3} -> 3 wins, {4,5} -> 5 wins,
    // unpaired 6 survives untouched
    Dedup.semanticDedupBy(embs, "vec_id", "embedding", "label", 0.9,
        col("vec_id") % 7)
      .select("vec_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(3L, 5L, 6L)
  }

  test("component survivors are a subset of greedy survivors in the pipeline") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def survivors(component: Boolean): Set[Long] =
      graft.pipelines.TrainingData.clean(docs, "doc_id", "text",
        nearDupThreshold = 0.02, componentDedup = component)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val comp = survivors(component = true)
    val greedy = survivors(component = false)
    comp.subsetOf(greedy) shouldBe true
    comp should not be empty
  }
}
