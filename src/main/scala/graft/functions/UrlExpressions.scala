package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** URL parsing helpers shared by [[UrlHostDomain]] and (conceptually) the
  * declarative twins in [[graft.operators.Urls]]: host = the regex group,
  * registered domain = the label-slice heuristic. Kept as plain Scala so
  * the imperative expression and the oracle stay three spellings of the
  * same character-level algorithm.
  */
object UrlParse {

  // same pattern the declarative twin and the DuckDB oracle use — the
  // RE2-compatible subset (no backreferences/lookaround)
  private val HostRe = java.util.regex.Pattern.compile(
    "^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?([^:/?#]+)")

  private val MultiPartSeconds =
    Set("co", "com", "net", "org", "gov", "ac", "edu")

  /** Lowercased host, or null when the url has no scheme/host. */
  def host(url: String): String = {
    val m = HostRe.matcher(url.toLowerCase(java.util.Locale.ROOT))
    if (m.find()) m.group(1) else null
  }

  /** eTLD+1 approximation (see [[graft.operators.Urls.registeredDomainOf]]
    * for the rules); null host -> null domain.
    */
  def registeredDomain(host: String): String = {
    if (host == null) return null
    val ls = host.split("\\.", -1)
    val n = ls.length
    val take =
      if (n >= 3 && MultiPartSeconds.contains(ls(n - 2)) && ls(n - 1).length == 2) 3
      else 2
    if (n <= take) host else ls.slice(n - take, n).mkString(".")
  }
}

/** url -> struct(host, domain) in ONE imperative pass — one compiled
  * regex, one label slice. The declarative composition of the same logic
  * (regexp_extract + split + slice, [[graft.operators.Urls.hostOf]] /
  * `registeredDomainOf`) is kept as the oracle-shaped reference twin, but
  * inlining it through projection collapse duplicated the regex subtree
  * ~16x per consumer and janino spent seconds compiling the result —
  * this expression keeps the plan tree (and the generated code) constant
  * size. CodegenFallback is acceptable per the TextExpressions rule: the
  * per-row cost IS the string work, not the eval dispatch.
  */
case class UrlHostDomain(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("host", StringType, nullable = true),
    StructField("domain", StringType, nullable = true)))
  override def prettyName: String = "url_host_domain"

  override def nullSafeEval(input: Any): Any = {
    val h = UrlParse.host(input.asInstanceOf[UTF8String].toString)
    if (h == null) InternalRow(null, null)
    else InternalRow(UTF8String.fromString(h),
      UTF8String.fromString(UrlParse.registeredDomain(h)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** url -> canonical url in ONE imperative pass — the dedup-key
  * normalization of [[graft.operators.Urls.canonicalUrl]] with the
  * anchored parts regex matched ONCE instead of once per extracted group
  * (the declarative twin re-evaluates it six times per row; this is the
  * [[UrlHostDomain]] situation again). Same java.util.regex engine and
  * the SAME pattern strings as the declarative composition, so the two
  * are value-identical by construction (spec-pinned on the canon
  * fixture); the declarative twin stays the oracle-shaped reference.
  * CodegenFallback per the TextExpressions rule: the per-row cost IS the
  * string work.
  */
case class UrlCanonicalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  import UrlCanonicalize._

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any = {
    val trimmed = input.asInstanceOf[UTF8String].trim().toString
    val f = Frag.matcher(trimmed).replaceAll("")
    val m = Parts.matcher(f)
    if (!m.matches()) return UTF8String.fromString(trimmed)
    def g(i: Int): String = Option(m.group(i)).getOrElse("")
    val scheme = UTF8String.fromString(g(1)).toLowerCase.toString
    val host = UTF8String.fromString(g(3)).toLowerCase.toString
    val port0 = g(4)
    val port = if ((scheme == "http" && port0 == ":80") ||
      (scheme == "https" && port0 == ":443")) "" else port0
    val path = Trail.matcher(g(5)).replaceAll("")
    val query = LeadQ.matcher(g(6)).replaceAll("")
    val kept = query.split("&", -1)
      .filter(seg => !Tracking.matcher(seg).find()).mkString("&")
    val sb = new java.lang.StringBuilder(f.length)
    sb.append(scheme).append("://").append(g(2)).append(host)
      .append(port).append(path)
    if (kept.nonEmpty) sb.append('?').append(kept)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UrlCanonicalize {
  // the EXACT pattern strings of the declarative twin, compiled once —
  // Spark's own regexp functions run java.util.regex too, so semantics
  // (including $-before-final-newline and group non-participation)
  // cannot drift between the two forms
  private val Frag = java.util.regex.Pattern.compile("#.*")
  private val Parts = java.util.regex.Pattern.compile(
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#@]*@)?([^:/?#]*)(:[0-9]+)?([^?]*)(\\?.*)?$")
  private val Trail = java.util.regex.Pattern.compile("/+$")
  private val LeadQ = java.util.regex.Pattern.compile("^\\?")
  private val Tracking = java.util.regex.Pattern.compile(
    "^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|yclid|ref_src)(=|$)")
}
