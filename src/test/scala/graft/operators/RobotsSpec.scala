package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** robots.txt gating: RFC 9309 group selection, longest-match with
  * allow-ties, the `*`/trailing-`$` pattern language, defaults for
  * missing files, and a property pinning the imperative matcher to the
  * regex translation the DuckDB oracle runs.
  */
class RobotsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val body =
    """# synthetic robots fixture
      |User-agent: FancyBot
      |User-agent: graftbot
      |Disallow: /p/1*
      |Allow: /p/12*$
      |Disallow: /*lang=de$
      |Crawl-delay: 3
      |
      |User-agent: *
      |Disallow: /p/*9
      |Allow:
      |""".stripMargin

  private def decide(agent: String, paths: String*): Seq[Boolean] = {
    import spark.implicits._
    paths.toDF("p")
      .select(Robots.allowed(col("p"),
        Robots.selectRules(lit(body), agent)).as("a"))
      .collect().map(_.getBoolean(0)).toSeq
  }

  test("group selection: a named agent gets ONLY its groups, others " +
      "fall to *, agent match is case-insensitive") {
    // graftbot's group blocks /p/1*; the * group does not
    decide("graftbot", "/p/15") shouldBe Seq(false)
    decide("GraftBot", "/p/15") shouldBe Seq(false)
    decide("otherbot", "/p/15") shouldBe Seq(true)
    // the * group blocks /p/*9; graftbot's does not
    decide("otherbot", "/p/39") shouldBe Seq(false)
    decide("graftbot", "/p/39") shouldBe Seq(true)
    // FancyBot shares graftbot's multi-agent header
    decide("fancybot", "/p/15") shouldBe Seq(false)
  }

  test("longest match wins; allow wins ties; trailing $ anchors") {
    // /p/12 matches Disallow /p/1* (len 5) AND Allow /p/12*$ (len 6)
    decide("graftbot", "/p/12") shouldBe Seq(true)
    decide("graftbot", "/p/125") shouldBe Seq(true)
    // the anchored de rule (len 9) beats the allow (len 6)
    decide("graftbot", "/p/125?lang=de") shouldBe Seq(false)
    // anchor means ENDS with lang=de — a longer tail escapes it
    decide("graftbot", "/p/125?lang=desc") shouldBe Seq(true)
    // unrelated paths default to allowed
    decide("graftbot", "/q/7") shouldBe Seq(true)
  }

  test("missing robots row decides allowed; empty-value rules drop") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://a.example.com/p/15?x=1"),
      (2L, "https://b.example.com/p/15")).toDF("id", "url")
    val robots = Seq(("a.example.com", body)).toDF("host", "body")
    val out = Robots.gate(urls, "url",
      broadcast(Robots.parse(robots, "host", "body", "graftbot")))
      .select("id", "allowed").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    out shouldBe Map(1L -> false, 2L -> true) // no robots for b -> allowed
    // the empty Allow: value in the * group must not allow-everything
    decide("otherbot", "/p/39") shouldBe Seq(false)
  }

  test("crawl-delay follows group selection; sitemaps are global") {
    import spark.implicits._
    val b =
      """Sitemap: https://a.example.com/map1.xml
        |User-agent: graftbot
        |Crawl-delay: 2.5
        |Crawl-delay: 1
        |Disallow: /x
        |User-agent: *
        |Crawl-delay: 10
        |Sitemap: https://a.example.com/map2.xml
        |User-agent: slowbot
        |Crawl-delay: notanumber
        |""".stripMargin
    def sel(agent: String) = Seq(1).toDF("i")
      .select(Robots.selectRules(lit(b), agent).as("r"))
      .select(Robots.crawlDelay(col("r")).as("d"),
        Robots.sitemaps(col("r")).as("s")).head()
    val g = sel("graftbot")
    g.getDouble(0) shouldBe 2.5 // first valid value in the group wins
    g.getSeq[String](1) shouldBe Seq("https://a.example.com/map1.xml",
      "https://a.example.com/map2.xml") // global, in file order
    sel("otherbot").getDouble(0) shouldBe 10.0 // the * group's delay
    sel("slowbot").isNullAt(0) shouldBe true // invalid number -> null
  }

  test("host and path-query extraction") {
    import spark.implicits._
    val rows = Seq(
      "https://crawler:pw@News.src1.example.com:8080/p/5?lang=de#frag",
      "http://h.example.org",
      "https://x.example.net?q=1").toDF("u")
      .select(Robots.urlHost(col("u")).as("h"),
        Robots.urlPathQuery(col("u")).as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    rows(0) shouldBe ("news.src1.example.com", "/p/5?lang=de")
    rows(1) shouldBe ("h.example.org", "/")
    rows(2) shouldBe ("x.example.net", "?q=1")
  }

  test("the gate runs under Structured Streaming (stream-static join): " +
      "a continuous URL frontier is gated per micro-batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val robots = Seq(("a.example.com", body)).toDF("host", "body")
    val parsed = Robots.parse(robots, "host", "body", "graftbot")
    val in = MemoryStream[(Long, String)]
    val q = Robots.gate(in.toDF().toDF("id", "url"), "url",
        org.apache.spark.sql.functions.broadcast(parsed))
      .writeStream.format("memory").queryName("robots_gated")
      .option("checkpointLocation", checkpoint()).start()
    try {
      in.addData((1L, "https://a.example.com/p/15"),
        (2L, "https://a.example.com/q/ok"),
        (3L, "https://other.example.net/p/15"))
      q.processAllAvailable()
      in.addData((4L, "https://a.example.com/p/125?lang=de"))
      q.processAllAvailable()
      val got = spark.table("robots_gated")
        .select("id", "allowed").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      got shouldBe Map(1L -> false, 2L -> true, 3L -> true, 4L -> false)
    } finally q.stop()
  }

  test("property: the imperative matcher equals the regex translation " +
      "the oracle runs, on random paths and patterns") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def rx(pattern: String): scala.util.matching.Regex = {
      val anchored = pattern.endsWith("$")
      val core = if (anchored) pattern.dropRight(1) else pattern
      val esc = core.flatMap {
        case c if "\\.+?()[]{}|^$".contains(c) => s"\\$c"
        case '*' => ".*"
        case c => c.toString
      }
      ("^" + esc + (if (anchored) "$" else "")).r
    }
    val pathChar = Gen.oneOf(('a' to 'd') ++ Seq('/', '9', '1', '?', '='))
    val pathGen = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, pathChar).map("/" + _.mkString))
    val patChar = Gen.frequency((5, pathChar), (3, Gen.const('*')))
    val patGen = for {
      n <- Gen.chooseNum(1, 8)
      cs <- Gen.listOfN(n, patChar)
      anchor <- Gen.oneOf("", "$")
    } yield "/" + cs.mkString + anchor
    import spark.implicits._
    val prop = Prop.forAll(pathGen, Gen.listOfN(4, patGen)) { (path, pats) =>
      val bodyGen = "User-agent: *\n" +
        pats.zipWithIndex.map { case (p, i) =>
          (if (i % 2 == 0) "Disallow: " else "Allow: ") + p }.mkString("\n")
      val got = Seq(path).toDF("p")
        .select(Robots.allowed(col("p"),
          Robots.selectRules(lit(bodyGen), "anybot")).as("a"))
        .head().getBoolean(0)
      // reference decision via the regex translation (find() with a
      // ^-prefixed pattern anchors at the start, exactly the oracle's
      // regexp_matches semantics)
      val matching = pats.zipWithIndex.filter { case (p, _) =>
        rx(p).pattern.matcher(path).find() }
      val expect = matching.isEmpty || {
        val wl = matching.map { case (p, i) =>
          (if (p.endsWith("$")) p.length - 1 else p.length, i % 2 != 0) }
        val m = wl.map(_._1).max
        wl.exists(t => t._1 == m && t._2) // any allow at max specificity
      }
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(60), prop)
    withClue(res.status) { res.passed shouldBe true }
  }
}
