package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, CreateStruct,
  CurrentRow, Descending, Expression, IntegerLiteral, LessThan, LessThanOrEqual,
  NamedExpression, NullsLast, RowFrame, RowNumber, SortOrder,
  SpecifiedWindowFrame, UnboundedPreceding, WindowExpression,
  WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project,
  Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the ubiquitous top-k-per-key idiom
  *
  *   row_number() OVER (PARTITION BY k ORDER BY o DESC ...) AS rn
  *   ... WHERE rn <= K          -- and rn dropped from the output
  *
  * is a per-key top-k in disguise. Spark's own InferWindowGroupLimit
  * truncates each group to K rows but still SORTS every group inside the
  * Window; this rule goes further and replaces the Filter+Window pair
  * with the partial/final TopKPerKeyNode heaps — no sort anywhere, and
  * at most partitions×K rows per key cross the exchange.
  *
  * Fires only when provably equivalent:
  *  - the Window computes exactly one expression: row_number() with the
  *    standard UNBOUNDED PRECEDING..CURRENT ROW row frame;
  *  - every ORDER BY key is DESCENDING (the heap keeps maxima; a mixed
  *    or ascending spec would need expression negation, which is not
  *    sound for all types);
  *  - the filter is `rn <= K` / `rn < K` with a positive integer K;
  *  - the projection above drops the rank column (the heap does not
  *    produce ranks) and references child columns only.
  *
  * Ordering ties resolve arbitrarily in both forms: row_number over a
  * non-total order is itself nondeterministic, so the rewrite never
  * loses a guarantee the original had.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private val MaxK = 100000 // heap size guard — beyond this, sorting wins anyway

  private def rowNumberAlias(w: Window): Option[(Attribute, Seq[Expression], Seq[SortOrder])] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(part, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) =>
        Some((a.toAttribute, part, order))
      case _ => None
    }

  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
      if a.exprId == rn.exprId && k >= 1 && k <= MaxK => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k))
      if a.exprId == rn.exprId && k >= 2 && k <= MaxK + 1 => Some(k - 1)
    case _ => None
  }

  /** InferWindowGroupLimit may already have inserted its truncation node
    * under the Window; the heap operator supersedes it. */
  private def unwrapGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case WindowGroupLimit(_, _, _, _, child) => child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      rowNumberAlias(w) match {
        case Some((rn, part, order))
          // part.nonEmpty: a global top-k (empty PARTITION BY) would give
          // TopKPerKeyNode a ClusteredDistribution(Nil), which Spark 4.1
          // rejects at planning; leave the global form to Spark's own
          // InferWindowGroupLimit instead.
          if part.nonEmpty && order.nonEmpty &&
            order.forall(_.direction == Descending) &&
            order.forall(_.nullOrdering == NullsLast) && // heap sorts nulls last

            part.forall(_.deterministic) &&
            order.forall(_.child.deterministic) &&
            projList.forall(_.deterministic) &&
            !p.references.contains(rn) =>
          limitOf(cond, rn) match {
            case Some(k) =>
              val child = unwrapGroupLimit(w.child)
              val ord: Expression =
                if (order.length == 1) order.head.child
                else CreateStruct(order.map(_.child))
              // the order value must be available as a column for the
              // heaps; synthesize it below the node and prune it above
              val ordAlias = Alias(ord, "__topk_ord")()
              val withOrd = Project(
                (child.output: Seq[NamedExpression]) :+ ordAlias, child)
              val partial = TopKPerKeyNode(part, ordAlias.toAttribute, k,
                global = false, withOrd)
              val fin = TopKPerKeyNode(part, ordAlias.toAttribute, k,
                global = true, partial)
              Project(projList, fin)
            case None => p
          }
        case _ => p
      }
  }
}
