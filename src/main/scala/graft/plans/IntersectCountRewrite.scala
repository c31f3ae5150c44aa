package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Expression, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{CharShingleHashes, SortedIntersectCount, WordShingleHashes}

/** Optimizer rule: `size(array_intersect(a, b))` → the native two-pointer
  * [[SortedIntersectCount]] merge, when BOTH inputs are provably
  * ascending-sorted and duplicate-free — i.e. they are literally the
  * shingle-hash expressions ([[WordShingleHashes]]/[[CharShingleHashes]]
  * emit `array_sort(array_distinct(…))`-shaped arrays by construction).
  *
  * Why a Rule[LogicalPlan] (SURVEY.md §7.4, extension path (c)): the
  * rewrite is a *plan-level* equivalence that holds only under a
  * data-property precondition (sortedness) the expression types encode;
  * callers write the portable built-in form and the optimizer swaps in
  * the O(n+m), zero-allocation merge — `array_intersect` builds a hash
  * set per call. The precondition is matched structurally (the inputs
  * ARE the producing expressions), never inferred, so the rule cannot
  * misfire on arbitrary arrays.
  *
  * Injected by [[graft.GraftExtensions]] via `injectOptimizerRule`;
  * sessions built with `spark.sql.extensions=graft.GraftExtensions` get
  * it automatically.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def sortedDistinct(e: Expression): Boolean = e match {
    case _: WordShingleHashes | _: CharShingleHashes => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), _) if sortedDistinct(l) && sortedDistinct(r) =>
        SortedIntersectCount(l, r)
    }
}
