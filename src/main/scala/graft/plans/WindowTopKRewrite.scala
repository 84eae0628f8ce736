package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, CurrentRow, Expression, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.plans.TopKPerKey.TopKPerKeyNode

/** Optimizer rule: rewrite the classic per-group top-k pattern
  *
  * {{{ Filter(rank <= k, [Project(...,)] Window(row_number() OVER
  *     (PARTITION BY keys ORDER BY ord) AS rank)) }}}
  *
  * into [[TopKPerKeyNode]] — WindowExec fully sorts every partition and
  * only then drops all but k rows per key; the heap operator never
  * sorts. The original `rank` attribute (IntegerType) is reconstructed
  * by casting the operator's long rank under the same expression id, so
  * downstream references are untouched.
  *
  * Fires only on the exact shape: a single row_number window expression
  * over the default row frame, filtered by `rank <= intLit` or
  * `rank < intLit`. Install via
  * `spark.experimental.extraOptimizations` or
  * `graft.functions.GraftExtensions` (injectOptimizerRule).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private object RowNumberWindow {
    /** Matches Window with exactly one row_number window expression. */
    def unapply(w: Window): Option[(Attribute, Seq[Expression],
        Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
        LogicalPlan)] =
      w.windowExpressions match {
        case Seq(a @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
                CurrentRow))), _)) =>
          Some((a.toAttribute, parts, order, w.child))
        case _ => None
      }
  }

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
          if a.semanticEquals(rank) => Some(k - 1)
      case _ => None
    }

  private def rewrite(rank: Attribute, parts: Seq[Expression],
                      order: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder],
                      child: LogicalPlan, k: Int,
                      projList: Option[Seq[NamedExpression]]): LogicalPlan = {
    val node = TopKPerKeyNode(parts, order, k, child)
    // rebuild the original int-typed rank under its original exprId
    val castRank = Alias(Cast(node.rankAttr, IntegerType), rank.name)(
      exprId = rank.exprId)
    val inner = Project(child.output :+ castRank, node)
    projList.map(Project(_, inner)).getOrElse(inner)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // parts.nonEmpty: a global top-n (empty PARTITION BY) must stay on
    // WindowExec — TopKPerKeyExec requires ClusteredDistribution(keys)
    // and Spark rejects an empty clustering, so rewriting would crash
    // the planner for a perfectly legal query.
    case f @ Filter(cond, RowNumberWindow(rank, parts, order, child))
        if parts.nonEmpty =>
      limitOf(cond, rank) match {
        case Some(k) if k > 0 =>
          rewrite(rank, parts, order, child, k, None)
        case _ => f
      }
    case f @ Filter(cond,
        p @ Project(projList, RowNumberWindow(rank, parts, order, child)))
        if parts.nonEmpty &&
          projList.exists(_.toAttribute.semanticEquals(rank)) &&
          projList.forall(_.isInstanceOf[Attribute]) =>
      limitOf(cond, rank) match {
        case Some(k) if k > 0 =>
          rewrite(rank, parts, order, child, k, Some(projList))
        case _ => f
      }
  }
}
