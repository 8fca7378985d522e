package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: bound edit-distance filters by length difference.
  *
  * `levenshtein(a, b) <= k` costs O(|a|·|b|) per row, but
  * `abs(length(a) - length(b))` is a LOWER bound on the distance (each
  * unmatched character needs at least one edit), so
  * `abs(length(a)-length(b)) <= k` is a necessary condition computable in
  * O(1) from the string headers. The rule conjoins that guard in front of
  * the comparison; `And` short-circuits in both interpreted and codegen
  * evaluation, so rows whose lengths already rule them out never run the
  * DP. On near-dup verification joins (battery q63's shape) most candidate
  * pairs that fail a tight threshold fail it on length alone.
  *
  * Rewrites `levenshtein <= k`, `< k`, and the symmetric `>=`/`>` forms
  * with a foldable threshold. Idempotent: a comparison already guarded by
  * its own length bound (same children, semantically) is left alone —
  * required because the optimizer runs batches to fixpoint.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def lenBound(a: Expression, b: Expression): Expression =
    Abs(Subtract(Length(a), Length(b)))

  /** Already guarded = the condition somewhere takes Length of either
    * operand. Matching the full guard shape is NOT robust: constant
    * folding rewrites the guard's literal-side Length between optimizer
    * iterations, so an exact-shape check would re-add a guard every pass.
    * A bare Length survives folding whenever the comparison itself does
    * (a both-sides-literal comparison folds away entirely). Conservative:
    * a user predicate that already lengths an operand suppresses the
    * guard.
    */
  private def guarded(cond: Expression, a: Expression, b: Expression): Boolean =
    cond.exists {
      case l: Length => l.child.semanticEquals(a) || l.child.semanticEquals(b)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      // transformUp: the rewrite embeds the matched node inside the
      // replacement, which transformDown would re-descend into forever
      // the guard re-evaluates both operands, which is only sound when
      // they are deterministic (a non-deterministic operand would be
      // sampled independently by guard and comparison)
      def ok(cond0: Expression, a: Expression, b: Expression): Boolean =
        a.deterministic && b.deterministic && !guarded(cond0, a, b)
      val rewritten = cond.transformUp {
        // lev(a,b) <= k  /  lev(a,b) < k
        case cmp @ LessThanOrEqual(Levenshtein(a, b, None), k: Literal)
            if ok(cond, a, b) =>
          And(LessThanOrEqual(lenBound(a, b), k), cmp)
        case cmp @ LessThan(Levenshtein(a, b, None), k: Literal)
            if ok(cond, a, b) =>
          And(LessThanOrEqual(lenBound(a, b), k), cmp)
        // k >= lev(a,b)  /  k > lev(a,b)
        case cmp @ GreaterThanOrEqual(k: Literal, Levenshtein(a, b, None))
            if ok(cond, a, b) =>
          And(LessThanOrEqual(lenBound(a, b), k), cmp)
        case cmp @ GreaterThan(k: Literal, Levenshtein(a, b, None))
            if ok(cond, a, b) =>
          And(LessThanOrEqual(lenBound(a, b), k), cmp)
      }
      if (rewritten fastEquals cond) f else f.copy(condition = rewritten)
  }
}
