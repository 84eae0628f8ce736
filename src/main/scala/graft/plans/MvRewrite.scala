package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, Coalesce, Expression, Literal, NamedExpression, PlanExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule: answer a rollup aggregation from a DECLARED
  * materialized aggregate instead of rescanning the base table — the
  * materialized-view rewrite every warehouse ships and Spark's
  * optimizer does not (Catalyst has no MV metadata for file relations).
  *
  * {{{ Aggregate(G ⊆ mv.groupCols, re-aggregable aggs, scan(base))
  *       ⇒ Aggregate(G, rewritten aggs, scan(mv)) }}}
  *
  * with SUM(x) → SUM(mv.sum_x), COUNT(*) → SUM(mv.cnt) (coalesced to 0
  * to keep COUNT's non-null contract), MIN(x) → MIN(mv.min_x),
  * MAX(x) → MAX(mv.max_x). These are exactly the self-decomposable
  * aggregates, so the rewrite is correct for ANY grouping subset of the
  * MV's grain — the algebra every cube/rollup engine relies on
  * (Gray et al. 1997). AVG is deliberately NOT rewritten: its correct
  * rollup needs a per-column non-null count the declaration doesn't
  * carry; callers express it as SUM/COUNT and get the rewrite for free.
  *
  * At 100 TB this is the difference between scanning the fact table
  * and scanning a table |distinct grain| rows long: a daily-grain MV of
  * a 100 TB event log is typically 4–6 orders of magnitude smaller, and
  * every dashboard rollup (weekly, monthly, per-region) re-aggregates
  * the MV, not the log.
  *
  * Scope guards (all checked, rewrite skipped otherwise):
  *  - the aggregate's child is the REGISTERED base scan — a
  *    `LogicalRelation(HadoopFsRelation)` whose root paths equal the
  *    registration's, optionally under a pruning `Project` of plain
  *    attributes (the shape column pruning leaves behind) and/or
  *    Filters whose predicates read ONLY grain columns (those drop
  *    whole grain groups, so they commute with the aggregation and
  *    ride along onto the MV scan — the classic rollup-with-WHERE
  *    dashboard query). Any other filter defeats the rewrite: the MV
  *    pre-aggregated unfiltered rows.
  *  - every grouping expression is a plain base column declared in the
  *    MV's grain; every aggregate is one of the four forms above on a
  *    plain column (no expressions — the MV declared columns, not
  *    arbitrary algebra).
  *  - DISTINCT aggregates never rewrite (not re-aggregable from sums).
  *
  * Result attributes keep their original `exprId`s, so parent operators
  * are untouched. Enable via [[MvRewrite.ConfKey]]; register MVs with
  * [[MvRewrite.register]]. Install like the other graft rules via
  * `spark.experimental.extraOptimizations`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Master switch: "true" enables the rewrite for registered MVs. */
  val ConfKey = "spark.graft.mvRewrite.enabled"

  /** One registered materialized aggregate.
    *
    * @param mvPlan    analyzed plan of the MV (typically a parquet scan)
    * @param groupCols the MV's grain — base grouping columns, in the
    *                  MV under the same names
    * @param sumCols   base column → MV column holding its per-grain SUM
    * @param minCols   base column → MV column holding its per-grain MIN
    * @param maxCols   base column → MV column holding its per-grain MAX
    * @param countCol  MV column holding the per-grain COUNT(*), if any
    */
  final case class MvDef(mvPlan: LogicalPlan, groupCols: Set[String],
                         sumCols: Map[String, String],
                         minCols: Map[String, String],
                         maxCols: Map[String, String],
                         countCol: Option[String])

  /** Several MVs may be registered per base (e.g. a daily grain and a
    * (region, day) grain); the rule picks the COARSEST one that still
    * covers the query — fewest grain columns ⇒ fewest rows to re-
    * aggregate, the standard navigational aggregate selection.
    */
  private val catalog = new ConcurrentHashMap[Set[String], List[MvDef]]()

  /** Declare `mv` as the (groupCols, sums/mins/maxs/count) rollup of the
    * base table at `basePath` — additive: earlier registrations for the
    * same base stay and compete on coverage. The MV's correctness is
    * the caller's promise — the rule checks shapes, not data.
    */
  def register(basePath: String, mv: DataFrame, groupCols: Seq[String],
               sumCols: Map[String, String] = Map.empty,
               minCols: Map[String, String] = Map.empty,
               maxCols: Map[String, String] = Map.empty,
               countCol: Option[String] = None): Unit = {
    val plan = mv.queryExecution.analyzed
    val have = plan.output.map(_.name).toSet
    val need = groupCols.toSet ++ sumCols.values ++ minCols.values ++
      maxCols.values ++ countCol
    val missing = need -- have
    require(missing.isEmpty, s"MV lacks declared columns: $missing")
    val d = MvDef(plan, groupCols.toSet, sumCols, minCols, maxCols, countCol)
    catalog.merge(rootKey(basePath, mv.sparkSession), List(d),
      (old, one) => one ::: old)
  }

  /** Drop every registration (tests). */
  def clear(): Unit = catalog.clear()

  /** Normalize a path the same way HadoopFsRelation reports rootPaths:
    * fully qualified with scheme and authority (`file:/...`, `s3a://...`)
    * — a raw `/root/...` registration would otherwise never match the
    * relation's qualified root and the rule would silently no-op.
    */
  private def rootKey(p: String,
                      spark: org.apache.spark.sql.SparkSession): Set[String] = {
    val path = new org.apache.hadoop.fs.Path(p)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    Set(fs.makeQualified(path).toString)
  }

  /** The registered base scan, possibly under a pruning Project and/or
    * Filters. Returns the matched MV plus every peeled filter condition
    * — the CALLER decides whether those conditions are grain-only (and
    * so commute with the aggregation) or defeat the rewrite.
    */
  private def baseMatch(plan: LogicalPlan)
      : Option[(List[MvDef], Seq[Expression])] =
    plan match {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          Option(catalog.get(fs.location.rootPaths.map(_.toString).toSet))
            .map(mvs => (mvs, Nil))
        case _ => None
      }
      case Project(pl, child)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        baseMatch(child)
      case Filter(cond, child) =>
        baseMatch(child).map { case (mvs, cs) => (mvs, cond +: cs) }
      case _ => None
    }

  /** A peeled filter commutes with the aggregation iff it only reads
    * grain columns (it then drops whole grain groups, before or after
    * aggregating — same thing), deterministically, with no subquery.
    */
  private def grainOnly(mv: MvDef, cond: Expression): Boolean =
    cond.deterministic &&
      !cond.exists(_.isInstanceOf[PlanExpression[_]]) &&
      cond.references.forall(a =>
        mv.groupCols.contains(a.name) &&
          mvAttr(mv, a.name).dataType == a.dataType)

  private def mvAttr(mv: MvDef, name: String): Attribute =
    mv.mvPlan.output.find(_.name == name).get

  /** Rewrite one result expression, or None if it is not coverable.
    * The replacement keeps the original exprId AND dataType — a decimal
    * SUM-of-SUMs gains another +10 precision under Spark's type rules,
    * so it is cast back to the original aggregate's type; parents bound
    * to the old attribute stay valid.
    */
  private def rewriteExpr(e: NamedExpression, mv: MvDef,
                          groups: Map[Attribute, Attribute])
      : Option[NamedExpression] = e match {
    case a: Attribute =>
      groups.get(a).map(m => Alias(m, a.name)(exprId = a.exprId))
    case al @ Alias(AggregateExpression(fn, Complete, false, None, _), name) =>
      val agg: Option[Expression] = fn match {
        case Sum(x: AttributeReference, ansi) =>
          mv.sumCols.get(x.name).map(c =>
            AggregateExpression(Sum(mvAttr(mv, c), ansi), Complete,
              isDistinct = false))
        case Min(x: AttributeReference) =>
          mv.minCols.get(x.name).map(c =>
            AggregateExpression(Min(mvAttr(mv, c)), Complete,
              isDistinct = false))
        case Max(x: AttributeReference) =>
          mv.maxCols.get(x.name).map(c =>
            AggregateExpression(Max(mvAttr(mv, c)), Complete,
              isDistinct = false))
        case Count(Seq(Literal(_, _))) =>
          // COUNT(*)/COUNT(lit): non-null long; SUM of the MV counts is
          // nullable by type, so pin the contract with a coalesce (the
          // MV has no rows only when the base has none → 0 is exact).
          mv.countCol.map(c =>
            Coalesce(Seq(
              AggregateExpression(Sum(mvAttr(mv, c)), Complete,
                isDistinct = false),
              Literal(0L))))
        case _ => None
      }
      agg.map { x =>
        val typed =
          if (x.dataType == al.child.dataType) x
          else org.apache.spark.sql.catalyst.expressions.Cast(
            x, al.child.dataType)
        Alias(typed, name)(exprId = al.exprId)
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (catalog.isEmpty ||
        !conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(groupExprs, resultExprs, child, _) =>
        baseMatch(child) match {
          case Some((mvs, conds)) =>
            // coarsest covering MV wins: fewest grain columns ⇒ fewest
            // rows to re-aggregate (ties: most recent registration)
            mvs.sortBy(_.groupCols.size).iterator
              .map(tryRewrite(_, groupExprs, resultExprs, conds))
              .collectFirst { case Some(r) => r }
              .getOrElse(agg)
          case _ => agg
        }
    }
  }

  /** Attempt the rewrite against ONE candidate MV; None if any guard
    * declines (non-grain group/filter column, uncoverable aggregate).
    */
  private def tryRewrite(mv: MvDef, groupExprs: Seq[Expression],
                         resultExprs: Seq[NamedExpression],
                         conds: Seq[Expression]): Option[LogicalPlan] = {
    val grouped = groupExprs.forall {
      case a: AttributeReference =>
        // exact type match required: the group attribute is re-pointed
        // at the MV column under the SAME exprId, so a type drift
        // would corrupt parent bindings
        mv.groupCols.contains(a.name) &&
          mvAttr(mv, a.name).dataType == a.dataType
      case _ => false
    }
    if (!grouped || !conds.forall(grainOnly(mv, _))) return None
    val groups = groupExprs.collect {
      case a: AttributeReference => (a: Attribute) -> mvAttr(mv, a.name)
    }.toMap
    val rewritten = resultExprs.map(rewriteExpr(_, mv, groups))
    if (!rewritten.forall(_.isDefined)) return None
    // grain-only predicates ride along, re-pointed at the MV's
    // columns (by NAME — the exprIds differ)
    val newChild =
      if (conds.isEmpty) mv.mvPlan
      else Filter(conds.reduce(And).transform {
        case a: AttributeReference => mvAttr(mv, a.name)
      }, mv.mvPlan)
    Some(Aggregate(groups.values.toSeq, rewritten.map(_.get), newChild))
  }
}
