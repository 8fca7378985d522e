package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt crawl-politeness gating (RFC 9309 subset) — the crawl
  * stage between WARC ingestion ([[Warc]]) and the URL/domain family
  * ([[Urls]]): given a table of per-host robots.txt bodies and a frame
  * of candidate URLs, keep the URLs the given user-agent may fetch.
  *
  * Scale shape: the PARSE runs once per robots row
  * ([[graft.functions.RobotsSelect]] — one imperative eval per host,
  * rules returned as two parallel arrays), the DECISION once per URL
  * ([[graft.functions.RobotsDecide]] — longest-match walk over the
  * joined rule arrays). The join is a plain equi join on host: robots
  * tables are rule-bounded by construction (RFC caps the file at
  * 500 KiB), so the rule arrays ride the exchange as small payloads;
  * broadcast the parsed side via `broadcast(parse(...))` when the host
  * universe fits. URLs whose host has no robots row are ALLOWED (the
  * RFC default for a missing file).
  */
object Robots {

  /** Host of a URL, lowercased: authority minus userinfo and port. */
  def urlHost(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Path-and-query match target of a URL (`/` when absent): what RFC
    * rule patterns are evaluated against.
    */
  def urlPathQuery(url: Column): Column = {
    val pq = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([/?][^#]*)", 1)
    when(pq === "", lit("/")).otherwise(pq)
  }

  /** Parse one robots body column into the rule struct governing
    * `agent`: (patterns ARRAY<STRING>, allows ARRAY<BOOLEAN>).
    */
  def selectRules(body: Column, agent: String): Column =
    call_function("robots_select", body, lit(agent))

  /** Crawl delay (seconds) the selected groups impose on `agent` —
    * the scheduler input beside the allow/deny gate; null when no
    * selected group carries a valid value.
    */
  def crawlDelay(rules: Column): Column = rules.getField("crawl_delay")

  /** Every sitemap URL declared in the file, in order (global per
    * RFC — independent of the agent's group selection).
    */
  def sitemaps(rules: Column): Column = rules.getField("sitemaps")

  /** Longest-match decision for one path against a rule struct (true
    * when fetchable; null rules — no robots row — decide true).
    */
  def allowed(pathQuery: Column, rules: Column): Column =
    call_function("robots_decide", pathQuery,
      rules.getField("patterns"), rules.getField("allows"))

  /** Parsed per-host rule table: (host, __robots_rules). */
  def parse(robots: DataFrame, hostCol: String, bodyCol: String,
      agent: String): DataFrame =
    robots.select(col(hostCol).as("__robots_host"),
      selectRules(col(bodyCol), agent).as("__robots_rules"))

  /** Gate `urls` by the robots table: input columns plus `allowed`.
    * Pass `parse(robots, ...)` through `broadcast(...)` upstream when
    * the host universe is broadcast-sized.
    */
  def gate(urls: DataFrame, urlCol: String, parsedRobots: DataFrame): DataFrame =
    urls
      .withColumn("__robots_h", urlHost(col(urlCol)))
      .join(parsedRobots,
        col("__robots_h") === col("__robots_host"), "left")
      .withColumn("allowed",
        allowed(urlPathQuery(col(urlCol)), col("__robots_rules")))
      .drop("__robots_h", "__robots_host", "__robots_rules")
}
