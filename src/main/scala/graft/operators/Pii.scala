package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based PII scrubbing for training-data pipelines: redact matches of
  * named regex rules (emails, phone numbers, IP addresses, ...) and report
  * per-rule match counts so a downstream gate can drop or quarantine
  * PII-heavy documents.
  *
  * Everything is built from codegen'd regex built-ins (`regexp_replace`,
  * `regexp_count`) — map-only, zero shuffles, stays inside whole-stage
  * codegen; at 100 TB this runs at scan speed alongside the other
  * per-document gates.
  *
  * Rule patterns stick to the regex subset that means the same thing in
  * Java regex and RE2 (character classes, bounded repetition, `\b`,
  * greedy quantifiers) so an external engine (the DuckDB oracle, or a
  * Python audit job) can replay the exact redaction. Counts are computed
  * on the ORIGINAL text; redaction applies the rules in order, so a later
  * rule never sees text a preceding rule already replaced. Replacement
  * tokens (`<EMAIL>`, ...) match none of the default rules, which makes
  * the scrub idempotent.
  */
object Pii {

  /** One redaction rule: matches of `pattern` are replaced by
    * `replacement`; the per-document match count is reported as
    * `n_<name>`.
    */
  final case class Rule(name: String, pattern: String, replacement: String)

  /** Local-part then host with a mandatory alphabetic TLD of length >= 2. */
  val Email: Rule = Rule("email",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")

  /** TPC-H style international phone: NN-NNN-NNN-NNNN. */
  val Phone: Rule = Rule("phone",
    "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")

  /** Dotted-quad IPv4 (no octet range check — redaction errs broad). */
  val Ipv4: Rule = Rule("ipv4",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")

  val DefaultRules: Seq[Rule] = Seq(Email, Phone, Ipv4)

  /** Redact `textCol` under `rules` (in order). Adds one `n_<rule>` count
    * column per rule (matches in the original text) and
    * `<textCol>_redacted` with all rules applied.
    */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.length == rules.length,
      "rule names must be unique")
    val text = col(textCol)
    val counts = rules.map(r =>
      regexp_count(text, lit(r.pattern)).cast("long").as(s"n_${r.name}"))
    val redacted = rules.foldLeft(text) { (c, r) =>
      regexp_replace(c, r.pattern, r.replacement)
    }
    df.select(df.columns.map(col).toIndexedSeq ++ counts
      :+ redacted.as(s"${textCol}_redacted"): _*)
  }

  /** Documents whose total PII match count exceeds `maxMatches` — the
    * quarantine side of the gate ([[scrub]] keeps every row; pipelines
    * route these for review instead of shipping them redacted).
    */
  def flagged(df: DataFrame, textCol: String, maxMatches: Long,
      rules: Seq[Rule] = DefaultRules): DataFrame = {
    val total = rules.map(r =>
      regexp_count(col(textCol), lit(r.pattern)).cast("long"))
      .reduce(_ + _)
    df.where(total > maxMatches)
  }
}
