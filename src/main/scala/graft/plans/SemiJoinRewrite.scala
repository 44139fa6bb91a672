package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `SELECT l.* FROM l JOIN (SELECT DISTINCT k FROM r) USING (k)`
  * is a semi-join in disguise (the lab03 J1 pattern — joining a fact
  * against a DISTINCT key set purely as a filter, script1.sql:37-38).
  * Rewriting to LeftSemi lets the build side stop at first match and
  * drops the distinct aggregation entirely when the join keys cover it.
  *
  * Fires only when provably safe:
  *  - the projection above the join uses left-side columns only;
  *  - the right side is a pure distinct (Aggregate whose outputs are
  *    exactly its grouping attributes);
  *  - the condition is a conjunction of equalities pinning EVERY right
  *    attribute to a left-side expression (so a left row can match at
  *    most one distinct right tuple — inner ≡ semi).
  */
object SemiJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def isPureDistinct(agg: Aggregate): Boolean =
    agg.aggregateExpressions.forall(_.isInstanceOf[Attribute]) &&
      agg.aggregateExpressions.map(_.asInstanceOf[Attribute].exprId).toSet ==
        agg.groupingExpressions.collect { case a: Attribute => a.exprId }.toSet &&
      agg.groupingExpressions.forall(_.isInstanceOf[Attribute])

  private def pinsAllRightAttrs(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Boolean = {
    val conjuncts = splitConjunctivePredicates(cond)
    val pinned = conjuncts.collect {
      case EqualTo(a: Attribute, e) if right.outputSet.contains(a) &&
        e.references.subsetOf(left.outputSet) => a.exprId
      case EqualTo(e, a: Attribute) if right.outputSet.contains(a) &&
        e.references.subsetOf(left.outputSet) => a.exprId
    }.toSet
    conjuncts.forall {
      case EqualTo(x, y) =>
        (x.references.subsetOf(left.outputSet) || x.references.subsetOf(right.outputSet)) &&
          (y.references.subsetOf(left.outputSet) || y.references.subsetOf(right.outputSet))
      case _ => false
    } && right.output.forall(a => pinned.contains(a.exprId))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList,
        j @ Join(left, agg: Aggregate, Inner, Some(cond), hint))
        if isPureDistinct(agg) &&
          p.references.subsetOf(left.outputSet) &&
          projectList.forall(_.deterministic) &&
          pinsAllRightAttrs(cond, left, agg) =>
      Project(projectList, Join(left, agg, LeftSemi, Some(cond), hint))
  }
}

/** Register via spark.sql.extensions=graft.plans.GraftExtensions (or
  * SparkSession.builder().withExtensions(new GraftExtensions)).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => SemiJoinRewrite)
}
