package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt parsing and URL matching (RFC 9309 subset) — the crawl-
  * politeness stage of the ingestion pipeline. Two expressions split
  * the work so the per-HOST parse and the per-URL decision scale
  * independently:
  *
  *   - [[RobotsSelect]] parses one robots.txt body and returns the rule
  *     list the given user-agent is governed by (group selection per
  *     RFC: groups naming the agent win; otherwise the `*` groups);
  *   - [[RobotsDecide]] evaluates one path-and-query against a rule
  *     list: the LONGEST matching pattern wins, allow wins ties, no
  *     match (or no rules) means allowed.
  *
  * Pattern language: every octet literal except `*` (any sequence) and
  * a TRAILING `$` (end anchor; `$` elsewhere is literal). Specificity
  * is the pattern length excluding a trailing `$` (it matches zero
  * octets). Directive names and agent tokens compare case-insensitive;
  * pattern values keep their case. `#` starts a comment; rules with an
  * empty value are dropped (the conventional empty-Disallow = no
  * restriction). `crawl-delay` attaches to its group (first valid
  * non-negative value wins within a group; the smallest among the
  * SELECTED groups is returned); `sitemap` values are global and
  * returned in file order. A `user-agent` line opens a new group unless the
  * previous directive was also `user-agent` (multi-agent headers share
  * one group); rules before any group header are ignored; blank and
  * unrecognized lines are transparent.
  *
  * Both are CodegenFallback imperative walks (the [[WordShingles]]
  * amortization argument) and the DuckDB oracle replays them: the
  * parse via line/window SQL, the match via the pattern translated to
  * an anchored regex — `*` to `.*` over a metachar-escaped core.
  */
case class RobotsSelect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("patterns", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("allows", ArrayType(BooleanType, containsNull = false),
      nullable = false),
    // smallest valid crawl-delay among the selected groups (null: none)
    StructField("crawl_delay", DoubleType, nullable = true),
    // every sitemap URL in the file, in order (global per RFC)
    StructField("sitemaps", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def prettyName: String = "robots_select"

  override def nullSafeEval(bodyAny: Any, agentAny: Any): Any = {
    val body = bodyAny.asInstanceOf[UTF8String].toString
    val agent = agentAny.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    // parse into groups: (agents, rules(pattern, allow), crawlDelay)
    final class Group {
      val agents = scala.collection.mutable.ArrayBuffer.empty[String]
      val rules =
        scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
      var crawlDelay: Option[Double] = None
    }
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    val sitemaps = scala.collection.mutable.ArrayBuffer.empty[String]
    var inUaRun = false
    body.split("\n", -1).foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val name = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        name match {
          case "user-agent" =>
            if (!inUaRun) groups += new Group
            if (value.nonEmpty) groups.last.agents +=
              value.toLowerCase(java.util.Locale.ROOT)
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last.rules += ((value, name == "allow"))
          case "crawl-delay" =>
            inUaRun = false
            if (groups.nonEmpty && groups.last.crawlDelay.isEmpty)
              groups.last.crawlDelay =
                scala.util.Try(value.toDouble).toOption.filter(_ >= 0)
          case "sitemap" =>
            inUaRun = false // global, but still ends a UA run
            if (value.nonEmpty) sitemaps += value
          case _ => inUaRun = false // other directives end a UA run
        }
      }
      // blank and unrecognized lines are transparent (RFC 9309: lines
      // carry no grouping meaning of their own)
    }
    val named = groups.filter(_.agents.contains(agent))
    val chosen =
      if (named.nonEmpty) named else groups.filter(_.agents.contains("*"))
    val rules = chosen.flatMap(_.rules)
    val ps = new Array[AnyRef](rules.length)
    val as = new Array[Any](rules.length)
    var i = 0
    while (i < rules.length) {
      ps(i) = UTF8String.fromString(rules(i)._1)
      as(i) = rules(i)._2
      i += 1
    }
    val delay = chosen.flatMap(_.crawlDelay).reduceOption(math.min(_, _))
    InternalRow(new GenericArrayData(ps), new GenericArrayData(as),
      delay.map(java.lang.Double.valueOf).orNull,
      new GenericArrayData(sitemaps.toArray.map(s =>
        UTF8String.fromString(s): AnyRef)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** See [[RobotsSelect]]. Returns NULL only when the path is null;
  * null/absent rule arrays (an unmatched robots join) mean allowed.
  */
case class RobotsDecide(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_decide"

  /** `*`-glob with optional trailing-`$` anchor, greedy segment walk. */
  private def matches(path: String, pattern: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val core = if (anchored) pattern.dropRight(1) else pattern
    val parts = core.split("\\*", -1)
    if (parts.length == 1)
      return if (anchored) path == core else path.startsWith(core)
    // first segment anchors at 0
    if (!path.startsWith(parts(0))) return false
    var pos = parts(0).length
    var i = 1
    while (i < parts.length - 1) {
      val at = path.indexOf(parts(i), pos)
      if (at < 0) return false
      pos = at + parts(i).length
      i += 1
    }
    val last = parts(parts.length - 1)
    if (anchored) path.length - last.length >= pos && path.endsWith(last)
    else path.indexOf(last, pos) >= 0
  }

  override def eval(input: InternalRow): Any = {
    val p = first.eval(input)
    if (p == null) return null
    val path = p.asInstanceOf[UTF8String].toString
    val psAny = second.eval(input)
    val asAny = third.eval(input)
    if (psAny == null || asAny == null) return true // no robots: allowed
    val ps = psAny.asInstanceOf[ArrayData]
    val as = asAny.asInstanceOf[ArrayData]
    require(ps.numElements() == as.numElements(),
      "robots_decide: patterns and allows must be equal length")
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < ps.numElements()) {
      val pat = ps.getUTF8String(i).toString
      if (matches(path, pat)) {
        // specificity excludes a trailing '$' (it matches zero octets)
        val len = if (pat.endsWith("$")) pat.length - 1 else pat.length
        if (len > bestLen) { bestLen = len; bestAllow = as.getBoolean(i) }
        else if (len == bestLen && as.getBoolean(i)) bestAllow = true
      }
      i += 1
    }
    bestAllow
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
