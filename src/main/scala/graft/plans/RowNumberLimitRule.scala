package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Optimizer rewrite (the `Rule[LogicalPlan]` tier of the extension
 * ladder, next to the [[TopKPerKeyStrategy]] planner strategy): the SQL
 * per-key top-k idiom
 *
 * {{{
 *   SELECT <cols not including rn> FROM (
 *     SELECT *, row_number() OVER (PARTITION BY k ORDER BY o) AS rn
 *     FROM t) WHERE rn <= 3
 * }}}
 *
 * is rewritten to the [[TopKPerKey]] logical operator, so the physical
 * plan runs bounded per-key heaps (O(n log k), no partition sort, no
 * window materialization) instead of Sort + Window + Filter. Spark's own
 * InferWindowGroupLimit only PRE-FILTERS rows entering the sort (the
 * full sort still runs); this rule removes the sort+window entirely when
 * the rank column itself is projected away — the common shape of "give
 * me the top k rows per key".
 *
 * The rewrite fires only when it is provably safe:
 *  - exactly one window expression, and it is `row_number()` (rank/
 *    dense_rank admit ties and do NOT mean "first k rows");
 *  - the filter bounds that rank by a positive integer literal
 *    (`rn <= k`, `rn < k`, mirrored forms, optionally AND-ed with
 *    residual predicates that don't reference rn — those stay as a
 *    Filter above the rewritten node);
 *  - the outer projection does not reference the rank column (TopKPerKey
 *    emits child rows only, in unspecified order);
 *  - the partition key list is non-empty (the operator's clustering
 *    contract; a global top-k is already TakeOrderedAndProject's job).
 *
 * Register cluster-wide via [[GraftExtensions]]
 * (`spark.sql.extensions`) or on a live session through
 * `spark.experimental.extraOptimizations`.
 */
object RowNumberLimitToTopK extends Rule[LogicalPlan] {

  /** cond ⇒ (k bound on `rn`, residual predicates not touching `rn`). */
  private def split(cond: Expression, rn: Attribute): (Option[Int], Seq[Expression]) = {
    val conjuncts = splitConjuncts(cond)
    val (bounds, rest) = conjuncts.partitionMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Left(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Left(k - 1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Left(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Left(k - 1)
      case other => Right(other)
    }
    // any residual predicate referencing rn (e.g. rn > 1 for pagination)
    // makes the rank itself load-bearing — not a plain top-k
    if (bounds.isEmpty || rest.exists(_.references.contains(rn))) (None, Nil)
    else (Some(bounds.min), rest)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            part, order, _, _)))
        if part.nonEmpty && order.nonEmpty &&
          !projList.exists(_.references.contains(alias.toAttribute)) =>
      split(cond, alias.toAttribute) match {
        case (Some(k), rest) if k >= 1 =>
          // InferWindowGroupLimit may already have inserted its pre-filter
          // below the window; TopKPerKey subsumes it, so plan the original
          // child rather than stacking two limiters
          val source = w.child match {
            case WindowGroupLimit(_, _, _, _, grandChild) => grandChild
            case other => other
          }
          val topk = TopKPerKey(part, order, k, source)
          val filtered = rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)
          Project(projList, filtered)
        case _ => p
      }
  }
}
