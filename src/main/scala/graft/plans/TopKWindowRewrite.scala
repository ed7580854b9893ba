package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (tier c's `Rule[LogicalPlan]` leg, injected via
  * `injectOptimizerRule`): rewrites the canonical window-form top-k —
  *
  *   Project [cols without rn]
  *     Filter (rn <= k)
  *       Window [row_number() OVER (PARTITION BY p ORDER BY o) AS rn]
  *
  * — into [[TopKPerKeyNode]], so code written in the idiomatic
  * DataFrame/SQL shape gets the bounded-heap physical plan for free
  * (no full per-partition sort, no WindowExec group buffering, k-row
  * map-side reduction; see [[TopKPerKeyExec]] and SCALE_NOTES.md for the
  * measured 2.6x on a hot-key input).
  *
  * Fires only when the rewrite is airtight:
  *  - the Window computes EXACTLY ONE expression, a plain row_number()
  *    (other window columns would need the full group);
  *  - the filter is `rn <= lit` / `rn < lit` and references nothing else;
  *  - the Project above drops rn (if rn survives, the caller wants ranks
  *    — the bounded heap discards them; [[TopKPerKey.topK]] is the
  *    rank-free API).
  * Rows are identical to the window form whenever the ordering is total;
  * with ties across the k boundary both plans keep an arbitrary — equally
  * valid — subset.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
            partSpec, orderSpec, child, _)))
        if partSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      limitOf(cond, rn) match {
        case Some(k) if k > 0 && !projList.exists(_.references.contains(rn)) =>
          Project(projList, TopKPerKeyNode(partSpec, orderSpec, k, child))
        case _ => p
      }
  }
}
