package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks evaluated in ONE pass over the data:
  * each check is a conditional aggregate, so N checks cost one scan +
  * one (tiny) aggregation — never N scans. The reference's only quality
  * mechanisms are operational (run-log states + manual SELECTs, docx
  * §3/§4.2); a warehouse at scale needs declared invariants evaluated on
  * every load.
  */
object Checks {

  sealed trait Check { def name: String; def failures: Column }

  /** Column must never be null. */
  final case class NotNull(colName: String) extends Check {
    val name = s"not_null($colName)"
    val failures: Column = sum(when(col(colName).isNull, 1L).otherwise(0L))
  }

  /** Column values must fall in [lo, hi]. */
  final case class InRange(colName: String, lo: Double, hi: Double)
      extends Check {
    val name = s"in_range($colName,$lo,$hi)"
    val failures: Column = sum(
      when(col(colName).isNotNull &&
        (col(colName) < lo || col(colName) > hi), 1L).otherwise(0L))
  }

  /** Column values must come from the allowed set. */
  final case class InSet(colName: String, allowed: Seq[String])
      extends Check {
    val name = s"in_set($colName)"
    val failures: Column = sum(
      when(col(colName).isNotNull &&
        !col(colName).isin(allowed: _*), 1L).otherwise(0L))
  }

  /** Arbitrary row-level predicate that must hold. */
  final case class Satisfies(name: String, predicate: Column) extends Check {
    val failures: Column = sum(when(!predicate, 1L).otherwise(0L))
  }

  /** Key (combination) must be unique. Unlike the row-level checks this
    * needs its own aggregation on the key.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    val name = s"unique(${cols.mkString(",")})"
    val failures: Column = lit(0L) // computed separately in run()
  }

  final case class Result(check: String, failures: Long, passed: Boolean)

  /** Evaluate all checks; row-level checks share one aggregation pass,
    * each Unique adds one groupBy on its key.
    */
  def run(df: DataFrame, checks: Seq[Check]): Seq[Result] = {
    val rowLevel = checks.filterNot(_.isInstanceOf[Unique])
    val rowResults: Seq[Result] =
      if (rowLevel.isEmpty) Nil
      else {
        val row = df.agg(rowLevel.head.failures.as("c0"),
          rowLevel.tail.zipWithIndex.map { case (c, i) =>
            c.failures.as(s"c${i + 1}") }: _*).head()
        rowLevel.zipWithIndex.map { case (c, i) =>
          val f = if (row.isNullAt(i)) 0L else row.getLong(i)
          Result(c.name, f, f == 0L)
        }
      }
    val uniqueResults = checks.collect { case u: Unique =>
      val dups = df.groupBy(u.cols.map(col): _*).count()
        .filter(col("count") > 1).count()
      Result(u.name, dups, dups == 0L)
    }
    rowResults ++ uniqueResults
  }
}
