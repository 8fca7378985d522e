package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sitemap XML parsing: urlset and sitemapindex entries, optional
  * fields, entity decoding, loc-less entries dropping, and frontier
  * composition with the robots `sitemaps` pointers.
  */
class SitemapsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val urlset =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <url>
      |    <loc>https://a.example.com/page?x=1&amp;y=2</loc>
      |    <lastmod>2025-11-04</lastmod>
      |    <changefreq>daily</changefreq>
      |    <priority>0.8</priority>
      |  </url>
      |  <url><loc> https://a.example.com/bare </loc></url>
      |  <url><lastmod>2025-01-01</lastmod></url>
      |</urlset>""".stripMargin

  private val index =
    """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |  <sitemap><loc>https://a.example.com/map-a.xml</loc>
      |    <lastmod>2025-10-01</lastmod></sitemap>
      |  <sitemap><loc>https://a.example.com/map-b.xml</loc></sitemap>
      |</sitemapindex>""".stripMargin

  test("urlset entries parse with optional fields; loc-less entries drop; " +
      "entities decode") {
    import spark.implicits._
    val out = Sitemaps.parse(Seq((1L, urlset)).toDF("id", "body"), "body")
      .orderBy("loc").collect()
    out.length shouldBe 2 // the loc-less third entry dropped
    val full = out.find(_.getAs[String]("loc")
      .contains("page")).get
    full.getAs[String]("kind") shouldBe "url"
    full.getAs[String]("loc") shouldBe "https://a.example.com/page?x=1&y=2"
    full.getAs[String]("lastmod") shouldBe "2025-11-04"
    full.getAs[String]("changefreq") shouldBe "daily"
    full.getAs[String]("priority") shouldBe "0.8"
    val bare = out.find(_.getAs[String]("loc").contains("bare")).get
    bare.getAs[String]("loc") shouldBe "https://a.example.com/bare" // trimmed
    bare.getAs[String]("lastmod") shouldBe null
    bare.getAs[String]("priority") shouldBe null
  }

  test("sitemapindex entries surface as kind=sitemap (fetch next)") {
    import spark.implicits._
    val out = Sitemaps.parse(Seq((1L, index)).toDF("id", "body"), "body")
      .orderBy("loc").collect()
    out.map(_.getAs[String]("kind")).toSeq shouldBe Seq("sitemap", "sitemap")
    out.map(_.getAs[String]("loc")).toSeq shouldBe Seq(
      "https://a.example.com/map-a.xml", "https://a.example.com/map-b.xml")
    out.head.getAs[String]("lastmod") shouldBe "2025-10-01"
  }

  test("frontier composition: robots sitemap pointers feed the parse, " +
      "repeated entries survive, input columns carry through") {
    import spark.implicits._
    val body = "User-agent: *\nDisallow: /private/\n" +
      "Sitemap: https://a.example.com/map.xml"
    val ptr = Seq(("a.example.com", body)).toDF("host", "rbody")
      .select(col("host"),
        explode(Robots.sitemaps(
          Robots.selectRules(col("rbody"), "graftbot"))).as("sitemap_url"))
    ptr.collect().map(_.getString(1)).toSeq shouldBe
      Seq("https://a.example.com/map.xml")

    // the fetched sitemap (same url twice: both entries must survive)
    val fetched = ptr.withColumn("body", lit(
      "<urlset><url><loc>https://a.example.com/p1</loc></url>" +
        "<url><loc>https://a.example.com/p1</loc></url></urlset>"))
    val urls = Sitemaps.parse(fetched, "body")
    urls.count() shouldBe 2
    urls.columns should contain allOf ("host", "sitemap_url", "kind", "loc")
  }
}
