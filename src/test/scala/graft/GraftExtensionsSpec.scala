package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** `spark.sql.extensions=graft.GraftExtensions` must make every graft
  * function callable from plain SQL in a fresh session — the deployment
  * path for a real cluster (no per-session register call).
  *
  * Extensions apply at SparkSession construction, so the test clears the
  * active/default session to force a genuinely new one (sharing the JVM's
  * SparkContext), then restores the shared session for later suites.
  * `spark.sql.extensions` is a *static* conf read from the SparkContext —
  * it cannot take effect on a reused context — so the test injects through
  * the equivalent programmatic `withExtensions(new GraftExtensions)` path.
  */
class GraftExtensionsSpec extends AnyFunSuite with Matchers {

  test("extension-injected functions resolve in SQL") {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sim = spark.sql(
        "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
        .head().getDouble(0)
      sim shouldBe 1.0 +- 1e-12

      val sh = spark.sql(
        "SELECT word_shingles(array('a','b','c','d'), 2) AS sh")
        .head().getSeq[String](0)
      sh shouldBe Seq("a b", "b c", "c d")

      val fp = spark.sql("SELECT simhash64(array('alpha','beta')) AS fp").head().getLong(0)
      val mh = spark.sql("SELECT minhash(array('alpha','beta'), 4, 7L) AS mh")
        .head().getSeq[Long](0)
      mh should have length 4
      fp should not be 0L

      // round-11 additions: positional (non-distinct) shingles, the
      // blocklist counter (SQL array() arrives as a foldable
      // CreateArray, not a Literal — the registry must take both), and
      // the MMR greedy
      spark.sql("SELECT positional_shingles(array('a','a','a'), 2) AS s")
        .head().getSeq[String](0) shouldBe Seq("a a", "a a")
      spark.sql(
        "SELECT phrase_hits(array('a','a','a','b'), array('a a', 'a b')) AS h")
        .head().getLong(0) shouldBe 3L
      spark.sql(
        """SELECT mmr_select(array(
             named_struct('id', 1L, 'rel', 900000L, 'emb', array(1.0d, 0.0d)),
             named_struct('id', 2L, 'rel', 899999L, 'emb', array(0.999d, 0.01d)),
             named_struct('id', 3L, 'rel', 500000L, 'emb', array(0.0d, 1.0d))),
           2, 500000L) AS sel""")
        .head().getSeq[Long](0) shouldBe Seq(1L, 3L)

      // the injected optimizer rule guards edit-distance filters with the
      // O(1) length lower bound, once (idempotent under fixpoint), without
      // changing results (parquet input — a local relation would be
      // constant-folded before the rule can show)
      import org.apache.spark.sql.functions.{col, levenshtein, lit}
      val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
        .select(col("p_partkey"), col("p_brand"))
      val filtered = part.where(levenshtein(col("p_brand"), lit("Brand#11")) <= 1)
      val opt = filtered.queryExecution.optimizedPlan.toString
      opt should include("abs((length(p_brand")
      "abs\\(\\(length".r.findAllIn(opt).length shouldBe 1

      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val expected = part.collect()
        .filter(r => lev(r.getString(1), "Brand#11") <= 1)
        .map(_.getLong(0)).toSet
      filtered.select("p_partkey").collect().map(_.getLong(0)).toSet shouldBe expected
      expected should not be empty
    } finally {
      // do NOT stop: the SparkContext is shared with every other suite
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }
}
