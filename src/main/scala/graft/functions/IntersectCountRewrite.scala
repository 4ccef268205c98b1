package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Cast, Expression, GreaterThan, If, IntegerLiteral, LambdaFunction, LessThan, NamedLambdaVariable, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: `size(array_intersect(x, y))` rewrites to the native
  * merge-pass [[SortedIntersectCount]] when both inputs are provably
  * sorted, duplicate-free, null-free long arrays — i.e. each side is
  * `array_sort(array_distinct(...))` with the DEFAULT ascending comparator.
  * Under those conditions the set-intersection cardinality equals the
  * sorted-merge count, and the per-row hash set that `array_intersect`
  * builds is pure overhead.
  *
  * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`), so SQL
  * and DataFrame users of the naive formulation get the kernel for free.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {

  /** The analyzed form of array_sort's default ascending comparator:
    * (l, r) -> if (l < r) -1 else if (l > r) 1 else 0. (The unbound
    * `ArraySort.defaultComparator` template never semanticEquals the bound
    * lambda, so match the structure.) */
  private def isAscendingComparator(f: Expression): Boolean = f match {
    case LambdaFunction(
        If(LessThan(a1, b1), IntegerLiteral(-1),
          If(GreaterThan(a2, b2), IntegerLiteral(1), IntegerLiteral(0))),
        Seq(v1: NamedLambdaVariable, v2: NamedLambdaVariable), _) =>
      a1.semanticEquals(v1) && b1.semanticEquals(v2) &&
        a2.semanticEquals(v1) && b2.semanticEquals(v2)
    case _ => false
  }

  private def isSortedDistinctLongs(e: Expression): Boolean = e match {
    case ArraySort(child, comparator, _) =>
      child.isInstanceOf[ArrayDistinct] &&
        isAscendingComparator(comparator) &&
        (e.dataType match {
          // ELEMENT nullability must be false: a non-nullable array can
          // still hold null slots (containsNull=true), and the merge-pass
          // kernel reads elements with getLong — rewriting there would
          // diverge from array_intersect's null semantics.
          case ArrayType(LongType, containsNull) => !containsNull
          case _ => false
        })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), legacy)
          if !legacy && isSortedDistinctLongs(l) && isSortedDistinctLongs(r) =>
        Cast(SortedIntersectCount(l, r), IntegerType)
    }
}
