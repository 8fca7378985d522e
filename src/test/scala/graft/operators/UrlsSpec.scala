package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** URL/domain operators: host parsing edge cases, the eTLD+1 heuristic,
  * the rollup, and the blocklist + per-domain cap gate (including the
  * NULL-domain group and determinism of cap membership).
  */
class UrlsSpec extends AnyFunSuite with Matchers with SparkSpec {

  import org.apache.spark.sql.DataFrame

  private def urls(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "url")
  }

  private def hostDomain(url: String): (String, String) = {
    val r = Urls.withDomain(urls(Seq((1L, url))), "url")
      .select(col("host"), col("domain")).head()
    (r.getString(0), r.getString(1))
  }

  test("host extraction: scheme, userinfo, port, path, query, case") {
    hostDomain("https://www.example.com/a/b?q=1") shouldBe
      (("www.example.com", "example.com"))
    hostDomain("http://user:pw@News.BBC.co.uk:8080/x#f") shouldBe
      (("news.bbc.co.uk", "bbc.co.uk"))
    hostDomain("ftp+ssh://files.example.org") shouldBe
      (("files.example.org", "example.org"))
    // bare host, single label: host == domain
    hostDomain("https://localhost:9000/") shouldBe (("localhost", "localhost"))
    // two labels, multi-part second but NO third label -> whole host
    hostDomain("https://co.uk/") shouldBe (("co.uk", "co.uk"))
  }

  test("unparseable urls give NULL host and domain") {
    val out = Urls.withDomain(urls(Seq(
      (1L, "no scheme here"), (2L, "https://"), (3L, null))), "url")
      .select(col("host"), col("domain")).collect()
    out.foreach { r =>
      r.isNullAt(0) shouldBe true
      r.isNullAt(1) shouldBe true
    }
  }

  test("registered domain: three-label host with non-multi second keeps 2") {
    hostDomain("https://a.b.example.com/") shouldBe
      (("a.b.example.com", "example.com"))
    // multi-part second-level but a LONG tld (not 2 letters) keeps 2
    hostDomain("https://x.co.name/") shouldBe (("x.co.name", "co.name"))
  }

  test("rollup counts docs, distinct hosts, and chars per domain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "https://a.example.com/1", 10L),
      (2L, "https://b.example.com/2", 20L),
      (3L, "https://a.example.com/3", 30L),
      (4L, "https://only.example.org/", 5L))
      .toDF("id", "url", "n_chars")
    val out = Urls.domainRollup(docs, "url", "n_chars")
      .orderBy(col("domain")).collect()
    out.map(_.getString(0)).toSeq shouldBe Seq("example.com", "example.org")
    out(0).getLong(1) shouldBe 3L // n_docs
    out(0).getLong(2) shouldBe 2L // n_hosts
    out(0).getLong(3) shouldBe 60L
    out(1).getLong(1) shouldBe 1L
  }

  test("gate: blocklist drops the domain, cap keeps the smallest ids") {
    import spark.implicits._
    val docs = (1L to 10L).map(i => (i, s"https://big.example.com/$i"))
      .++(Seq((20L, "https://bad.example.org/x"),
        (21L, "https://tiny.example.net/y")))
      .toDF("id", "url")
    val out = Urls.domainGate(docs, "url", "id",
        blocklist = Seq("example.org"), maxPerDomain = 4L)
      .select("id").collect().map(_.getLong(0)).toSet
    // example.org blocked entirely; example.com capped to ids 1-4;
    // example.net under cap passes whole
    out shouldBe Set(1L, 2L, 3L, 4L, 21L)
  }

  test("gate: a NULL id fails loud, not silently dropped from over-cap domains") {
    import spark.implicits._
    val docs = Seq((Some(1L), "https://big.example.com/1"),
      (Some(2L), "https://big.example.com/2"),
      (None: Option[Long], "https://big.example.com/3"))
      .toDF("id", "url")
    val e = intercept[Exception] {
      Urls.domainGate(docs, "url", "id", maxPerDomain = 1L).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + messages(t.getCause)
    messages(e) should include("contains NULL")
  }

  test("gate: the NULL-domain group is capped too") {
    import spark.implicits._
    val docs = Seq((1L, "not a url"), (2L, "also not"), (3L, "still not"),
      (4L, "https://ok.example.com/"))
      .toDF("id", "url")
    val out = Urls.domainGate(docs, "url", "id", maxPerDomain = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    out shouldBe Set(1L, 2L, 4L)
  }

  test("imperative UrlHostDomain is value-identical to the declarative twins") {
    import spark.implicits._
    val fixture = Seq(
      "https://www.example.com/a?b=1", "http://u:p@NEWS.bbc.CO.UK:8080/x",
      "ftp://files.example.org#frag", "https://localhost/", "https://co.uk",
      "https://a.b.c.d.example.com/deep", "https://x.co.name/", "no scheme",
      "https://", "https://host.with.trailing./", "weird://9start.example.com")
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val imp = Urls.withDomain(fixture, "url")
      .select(col("id"), col("host"), col("domain"))
    val dec = fixture
      .withColumn("host", Urls.hostOf(col("url")))
      .withColumn("domain", Urls.registeredDomainOf(col("host")))
      .select(col("id"), col("host"), col("domain"))
    imp.exceptAll(dec).count() shouldBe 0L
    dec.exceptAll(imp).count() shouldBe 0L
  }

  test("pslDomains: plain, wildcard, exception, and default rules") {
    import spark.implicits._
    val psl = Seq(
      "// fixture public suffix list", "",
      "com", "uk", "co.uk", "au", "com.au", "net", "name", "co.name",
      "*.ck", "!www.ck")
    val hosts = Seq(
      "news.bbc.co.uk", "bbc.co.uk", "co.uk", // multi-label plain
      "a.foo.com.au", "foo.com.au", // the com.au family
      "www.example.com", "example.com",
      "foo.bar.ck", "bar.ck", "www.ck", "a.www.ck", // wildcard + exception
      "x.y.zz", "zz" // unlisted TLD -> default rule
    ).zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val out = Urls.pslDomains(hosts, "host", psl)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out("news.bbc.co.uk") shouldBe "bbc.co.uk"
    out("bbc.co.uk") shouldBe "bbc.co.uk"
    out("co.uk") shouldBe "co.uk" // a public suffix maps to itself
    out("a.foo.com.au") shouldBe "foo.com.au"
    out("foo.com.au") shouldBe "foo.com.au"
    out("www.example.com") shouldBe "example.com"
    out("foo.bar.ck") shouldBe "foo.bar.ck" // *.ck: bar.ck is public
    out("bar.ck") shouldBe "bar.ck"
    out("www.ck") shouldBe "www.ck" // !www.ck carves it back out
    out("a.www.ck") shouldBe "www.ck"
    out("x.y.zz") shouldBe "y.zz" // default rule: last label is public
    out("zz") shouldBe "zz"
  }

  test("heuristic registeredDomainOf agrees with the PSL on common cases") {
    import spark.implicits._
    // the dominant shapes the heuristic was built for — on these the
    // data-driven and heuristic answers must be identical
    val psl = Seq("com", "org", "net", "uk", "co.uk", "au", "com.au")
    val hosts = Seq("example.com", "www.example.com", "a.b.example.com",
      "news.bbc.co.uk", "bbc.co.uk", "files.example.org", "localhost")
      .zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "host")
    val viaPsl = Urls.pslDomains(hosts, "host", psl)
    val viaHeuristic = hosts.select(col("host"),
      Urls.registeredDomainOf(col("host")).as("domain"))
    viaPsl.exceptAll(viaHeuristic).count() shouldBe 0L
    viaHeuristic.exceptAll(viaPsl).count() shouldBe 0L
  }

  test("withDomainPsl keys a url column through the suffix table") {
    import spark.implicits._
    val df = Seq(
      (1L, "https://News.BBC.co.uk/story"),
      (2L, "https://a.foo.com.au/x"),
      (3L, "no url here")).toDF("id", "url")
    val out = Urls.withDomainPsl(df, "url",
        Seq("uk", "co.uk", "au", "com.au"))
      .select(col("id"), col("host"), col("domain"))
      .orderBy(col("id")).collect()
    (out(0).getString(1), out(0).getString(2)) shouldBe
      (("news.bbc.co.uk", "bbc.co.uk"))
    (out(1).getString(1), out(1).getString(2)) shouldBe
      (("a.foo.com.au", "foo.com.au"))
    out(2).isNullAt(1) shouldBe true
    out(2).isNullAt(2) shouldBe true
  }

  private val canonCases = Seq(
    // fragment + default port + tracking params + host/scheme case
    ("HTTPS://WWW.Example.COM:443/Path/To/?utm_source=x&q=1#frag",
      "https://www.example.com/Path/To?q=1"),
    ("http://Host.com:80/", "http://host.com"),
    ("http://host.com:8080/a/", "http://host.com:8080/a"), // non-default port kept
    ("https://h.io/p?utm_a=1&utm_b=2", "https://h.io/p"), // query drops its ?
    ("https://h.io/p?fbclid", "https://h.io/p"), // bare tracking key
    ("https://h.io/p?a=1&gclid=2&b=3", "https://h.io/p?a=1&b=3"), // order kept
    ("https://u:Pw@H.io/x", "https://u:Pw@h.io/x"), // userinfo case kept
    ("https://h.io", "https://h.io"),
    ("  https://h.io///  ", "https://h.io"),
    ("https://h.io/p?x=1/", "https://h.io/p?x=1/"), // slash in query kept
    ("not a url", "not a url"), // no scheme: passthrough
    (null, null))

  test("canonicalUrl: fragments, case, ports, slashes, tracking params") {
    import spark.implicits._
    val out = canonCases.map(_._1).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
      .select(col("id"), Urls.canonicalUrl(col("url")).as("c"))
      .orderBy(col("id")).collect().map(r =>
        if (r.isNullAt(1)) null else r.getString(1))
    out.toSeq shouldBe canonCases.map(_._2)
  }

  test("imperative UrlCanonicalize is value-identical to the declarative twin") {
    import spark.implicits._
    val fixture = (canonCases.map(_._1).filter(_ != null) ++ Seq(
      "https://h.io/a//b///?x=1&utm_x&y=2#f#g", "HTTP://EX.COM:80?",
      "https://u@H:443/", "https://h/?&", "s3+x://Bucket.Name/Key/",
      "https://h.io/p?utm_source", "  x://y  ", "http://h:080/",
      "https://h.io/p?a=utm_b&utm_b=a", "://nohost", "https://#only"))
      .zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = fixture.select(col("id"),
        Urls.canonicalUrl(col("url")).as("imp"),
        Urls.canonicalUrlDeclarative(col("url")).as("dec"))
      .where(!(col("imp") <=> col("dec")))
      .collect()
    withClue(out.map(_.toSeq.mkString("|")).mkString("\n")) {
      out shouldBe empty
    }
  }

  test("canonicalUrl is idempotent: canon(canon(x)) = canon(x)") {
    import spark.implicits._
    val df = canonCases.map(_._1).filter(_ != null).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val once = Urls.canonicalUrl(col("url"))
    val diff = df.select(col("id"), once.as("c1"),
        Urls.canonicalUrl(once).as("c2"))
      .where(!(col("c1") <=> col("c2")))
    diff.count() shouldBe 0L
  }

  test("gate plan: bounded aggregate, never a per-domain window sort") {
    import spark.implicits._
    val docs = (1L to 10L).map(i =>
      (i, s"https://mega.example.com/$i")).toDF("id", "url")
    val plan = Urls.domainGate(docs, "url", "id", maxPerDomain = 2L)
      .queryExecution.executedPlan.toString
    // over-cap domains are the GIANT ones: a Window.partitionBy(domain)
    // would sort a mega-domain in one task; the gate must select keepers
    // with the partial/final bounded aggregator instead
    plan should not include "Window"
    plan should include("ObjectHashAggregate")
  }

  test("gate output keeps original columns and is replay-stable") {
    import spark.implicits._
    val docs = (1L to 6L).map(i =>
      (i, s"https://dom.example.com/$i", s"body$i")).toDF("id", "url", "text")
    val a = Urls.domainGate(docs, "url", "id", maxPerDomain = 3L)
    a.columns.toSeq shouldBe Seq("id", "url", "text")
    val b = Urls.domainGate(docs, "url", "id", maxPerDomain = 3L)
    a.collect().map(_.toSeq).toSet shouldBe b.collect().map(_.toSeq).toSet
  }
}
