package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan,
  Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` rung of the extension
  * ladder): rewrite the ranking-window top-k idiom
  *
  * {{{ Project(cols,
  *       Filter(rn <= k,
  *         Window(row_number() OVER (PARTITION BY keys ORDER BY ord)
  *           AS rn, child))) }}}
  *
  * into [[TopKPerKeyNode]] — bounded per-key heaps instead of the
  * window's full partition sort — whenever the rank column itself is
  * projected away (the usual shape: rank exists only to be filtered
  * on). Spark's own InferWindowGroupLimit trims partitions to ~k rows
  * but still sorts and ranks what remains; this removes the
  * sort-and-rank entirely. Ties behave as in the window form: both
  * keep an arbitrary k among order-equal rows, so pass a total order
  * for deterministic output.
  *
  * Deliberately conservative: single row_number window expression,
  * non-empty PARTITION BY (global top-k already plans as
  * TakeOrderedAndProject), a bare `rank cmp literal` predicate, and no
  * other use of the rank attribute.
  *
  * ON by default (`spark.graft.topk.rewrite=false` restores the window
  * plan): TopKPerKeyExec's distinct-keys-per-task × k heap map is
  * spillable (ExternalAppendOnlyMap-backed since round 7), so the
  * rewrite is safe at any key cardinality — bounded keys stay in
  * memory and win on the removed sort; near-unique keys spill heap
  * runs to disk like the window sort would have spilled its buffer.
  * Explicit `TopKPerKey(...)` calls never consult the flag.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  /** Session-conf gate for the automatic idiom rewrite. */
  val FLAG = "spark.graft.topk.rewrite"

  /** k such that `cond` ≡ rank <= k, if it has that shape. */
  private def limitOf(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(k: Int, _))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: AttributeReference, Literal(k: Int, _))
        if a.semanticEquals(rank) => Some(k - 1)
      case GreaterThanOrEqual(Literal(k: Int, _), a: AttributeReference)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(Literal(k: Int, _), a: AttributeReference)
        if a.semanticEquals(rank) => Some(k - 1)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FLAG, "true").toBoolean) plan
    else plan.transformUp {
    case p @ Project(projectList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, child, _)))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty &&
          limitOf(cond, alias.toAttribute).exists(_ > 0) &&
          p.references.subsetOf(child.outputSet) =>
      Project(projectList,
        TopKPerKeyNode(partitionSpec, orderSpec,
          limitOf(cond, alias.toAttribute).get, child))
  }
}
