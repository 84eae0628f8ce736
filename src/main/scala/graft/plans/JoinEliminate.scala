package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: redundant-join elimination on declared unique keys —
  * the constraint-based optimization every warehouse engine ships and
  * Spark's optimizer does not (Catalyst carries no uniqueness
  * metadata for file relations).
  *
  * A LEFT OUTER equi-join against a side whose join key is UNIQUE
  * preserves the left rows exactly once each — matched or not — so when
  * the query consumes ONLY left-side columns, the join is a no-op and is
  * removed:
  *
  * {{{ Project(cols ⊆ left) ── Join(left, right, LeftOuter,
  *     left.fk = right.uk)   ⇒   Project(cols, left) }}}
  *
  * Soundness needs nothing but uniqueness of `right.uk` (no referential
  * integrity: unmatched rows survive a left join): duplicates on the
  * right are the only way a left-outer join can change left's
  * cardinality. Uniqueness is DECLARED, not inferred — set
  * [[JoinEliminate.ConfKey]] to a comma-separated list of column names
  * the data owner guarantees unique within their table (e.g. the
  * `*_key` dimension PKs). An empty/unset conf disables the rule
  * entirely.
  *
  * At 100 TB this deletes a whole broadcast (or worse, shuffle) stage:
  * a star query that left-joins six dims but reads columns from two of
  * them pays for two, not six — the same reason BI generators emit
  * every dim join unconditionally and rely on the engine to drop the
  * unused ones.
  *
  * Inner joins are NOT eliminated (they filter unmatched rows — needs
  * referential integrity on top of uniqueness, a stronger promise), and
  * any reference to a right-side column defeats the rewrite.
  */
object JoinEliminate extends Rule[LogicalPlan] {

  /** Comma-separated unique column names, e.g. `"n_nationkey,r_regionkey"`. */
  val ConfKey = "spark.graft.uniqueKeys"

  private def uniqueCols: Set[String] =
    conf.getConfString(ConfKey, "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val uniq = uniqueCols
    if (uniq.isEmpty) plan
    else plan.transformUp {
      case p @ Project(projectList,
          Join(left, right, LeftOuter,
            Some(EqualTo(a: Attribute, b: Attribute)), _))
          if eliminable(p, left, right, a, b, uniq) =>
        Project(projectList, left)
    }
  }

  private def eliminable(p: Project, left: LogicalPlan, right: LogicalPlan,
                         a: Attribute, b: Attribute,
                         uniq: Set[String]): Boolean = {
    val rightKey =
      if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some(b)
      else if (left.outputSet.contains(b) && right.outputSet.contains(a))
        Some(a)
      else None
    rightKey.exists(rk => uniq.contains(rk.name)) &&
      p.references.subsetOf(left.outputSet)
  }
}
