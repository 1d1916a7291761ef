package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.functions.LevBounded

/** Conf-gated optimizer rule (default OFF, like [[GraftTopKMarkRule]]):
  * rewrites threshold comparisons of the built-in `levenshtein` —
  * `levenshtein(a, b) <= k`, `< k`, and their mirrored forms — to the
  * banded kernel `lev_bounded(a, b, k) <= k`, which evaluates only the
  * 2k+1-wide DP diagonal with early exit: O(k·n) vs O(n²) per comparison
  * (functions/LevBounded.scala). The rewrite is semantics-preserving by the
  * kernel's contract (`lev_bounded(a,b,k) <= k ⟺ levenshtein(a,b) <= k`,
  * property-tested in LevBoundedSpec) and only fires on foldable
  * non-negative int thresholds INSIDE a comparison — a bare
  * `levenshtein(a, b)` projection keeps the exact built-in.
  *
  * This is the optimizer-extension counterpart of exposing `lev_bounded`
  * directly (g30b): users keep writing the stock function, the session
  * opted into `spark.graft.levenshtein.autoRewrite=true` gets the banded
  * plan everywhere — filters, join conditions, CASE arms.
  */
object GraftLevBoundedRule extends Rule[LogicalPlan] {

  val Flag = "spark.graft.levenshtein.autoRewrite"

  private def bound(e: Expression): Option[Int] = e match {
    case lit: Literal if lit.dataType == IntegerType && lit.value != null =>
      Some(lit.value.asInstanceOf[Int]).filter(_ >= 0)
    case _ => None
  }

  /** levenshtein with the default (no-threshold) 2-arg form only — the
    * 3-arg built-in already carries its own bound. */
  private object Lev {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case l: Levenshtein if l.children.length == 2 =>
        Some((l.children(0), l.children(1)))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transformAllExpressions {
      // lev(a,b) <= k  /  k >= lev(a,b)
      case LessThanOrEqual(Lev(a, b), kl @ Literal(_, _)) if bound(kl).isDefined =>
        LessThanOrEqual(LevBounded(a, b, kl), kl)
      case GreaterThanOrEqual(kl @ Literal(_, _), Lev(a, b)) if bound(kl).isDefined =>
        GreaterThanOrEqual(kl, LevBounded(a, b, kl))
      // lev(a,b) < k  /  k > lev(a,b): band at k — exact distances < k stay
      // below the bound, and any distance >= k maps to >= k either way
      case LessThan(Lev(a, b), kl @ Literal(_, _)) if bound(kl).isDefined =>
        LessThan(LevBounded(a, b, kl), kl)
      case GreaterThan(kl @ Literal(_, _), Lev(a, b)) if bound(kl).isDefined =>
        GreaterThan(kl, LevBounded(a, b, kl))
    }
}
