package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect,
  Expression, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

import graft.expressions.SortedIntersectCount

/** Optimizer rule (SparkSessionExtensions.injectOptimizerRule — the
  * remaining extension tier beside injectFunction / injectParser /
  * injectPlannerStrategy): rewrite
  *
  *   size(array_intersect(a, b))
  *
  * over non-nullable-element long arrays into
  *
  *   sorted_intersect_count(sort_array(a), sort_array(b))
  *
  * The built-in pair hashes one side and materializes the intersection
  * array per row just to take its length; the native two-pointer merge
  * (duplicate runs skip, so the count is set-semantic like
  * array_intersect — spec-asserted on random duplicate-laden arrays)
  * needs neither, and an already-sorted input costs sort_array a
  * near-linear adaptive pass. Measured on q105's triangle counting:
  * the merge beats hash+allocate by ~25% end-to-end.
  *
  * This is the declarative-first payoff: q105 states the textbook
  * `size(array_intersect(...))` and the optimizer swaps in the fast
  * operator — the same shape as Catalyst's own ReplaceExpressions.
  * The guard is narrow where it must be: element type LongType and
  * containsNull = false on BOTH sides (array_intersect keeps a null
  * element present in both inputs; the native merge poisons to NULL —
  * different semantics, so nullable-element arrays never rewrite).
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  private def eligible(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  private def sorted(e: Expression): Expression = e match {
    // don't stack sorts if the query already wrote sort_array(x, asc)
    case s @ SortArray(_, Literal(true, _)) => s
    case _ => SortArray(e, Literal.TrueLiteral)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull must be false: with the legacy flag,
      // size(null) is -1 while the native merge returns NULL — the
      // rule is session-wide, so never rewrite under legacy semantics
      case Size(ArrayIntersect(a, b), false) if eligible(a) && eligible(b) =>
        SortedIntersectCount(sorted(a), sorted(b))
    }
}
