package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap parsing (sitemaps.org XML) — the crawl-DISCOVERY stage
  * closing the loop [[Warc]] (fetch) → [[Robots]] (politeness, whose
  * `sitemaps` field points here) → frontier: one sitemap body explodes
  * into its `<url>` entries (or, for a `<sitemapindex>`, into the child
  * sitemap locations to fetch next), all with declarative map-only
  * string primitives — regexp explode + per-entry field extraction —
  * so the parse rides the scan like the WARC framing does.
  *
  * Deliberately schema-light: fields come back as trimmed,
  * entity-decoded strings (`loc` required — entryless rows drop;
  * `lastmod`/`changefreq`/`priority` null when absent) and the caller
  * casts (`to_date`, `cast("double")`) under its own error policy.
  * Only the five predefined XML entities are decoded — sitemap locs
  * are URLs, which need nothing further.
  *
  * Frontier composition: feed `kind='sitemap'` rows back through the
  * fetcher, union the `kind='url'` locs, and let
  * [[Dedup.incrementalExactDedup]] on the loc be the crawl seen-set.
  */
object Sitemaps {

  private def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&") // amp LAST: &amp;lt; -> &lt;
      .foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }

  private def field(entry: Column, tag: String): Column = {
    val v = regexp_extract(entry, s"(?s)<$tag[^>]*>(.*?)</$tag>", 1)
    when(trim(v) === "", lit(null)).otherwise(decodeEntities(trim(v)))
  }

  /** Explode one body column of sitemap XML into entries:
    * (input columns..., kind, loc, lastmod, changefreq, priority) —
    * `kind` is `url` for urlset members and `sitemap` for index
    * members (fetch those next). Entries without a `<loc>` drop.
    */
  def parse(sitemaps: DataFrame, bodyCol: String): DataFrame = {
    // concat, not array_union: identical repeated entries must survive
    val entries = concat(
      transform(expr(
        s"regexp_extract_all($bodyCol, '(?s)<url[\\\\s>](.*?)</url>', 1)"),
        e => struct(lit("url").as("kind"), e.as("entry"))),
      transform(expr(
        s"regexp_extract_all($bodyCol, " +
          "'(?s)<sitemap[\\\\s>](.*?)</sitemap>', 1)"),
        e => struct(lit("sitemap").as("kind"), e.as("entry"))))
    sitemaps
      .withColumn("__sm", explode(entries))
      .withColumn("kind", col("__sm.kind"))
      .withColumn("loc", field(col("__sm.entry"), "loc"))
      .withColumn("lastmod", field(col("__sm.entry"), "lastmod"))
      .withColumn("changefreq", field(col("__sm.entry"), "changefreq"))
      .withColumn("priority", field(col("__sm.entry"), "priority"))
      .where(col("loc").isNotNull)
      .drop("__sm", bodyCol)
  }
}
