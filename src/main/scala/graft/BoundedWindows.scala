package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** The repo's GLOBAL-ORDER window contract, named so it is visible and
  * greppable at every call site.
  *
  * A window ordered without a partition key moves all rows to one
  * partition — the planner warns loudly because on a data-sized input
  * that is a scale killer. Every such window in this library is
  * deliberate and runs over a frame that is already reduced to a
  * BOUNDED grid before the window: calendar days/weeks of the dataset,
  * distinct lags, quantile/decile boundaries, histogram buckets,
  * top-k heads. Those cardinalities are fixed by the query's own
  * semantics (a year has 365 days no matter how many trillion events
  * it holds), so the single partition holds a bounded row count at ANY
  * data scale and cannot become a straggler.
  *
  * Windows over data-sized inputs must keep using
  * `Window.partitionBy(...).orderBy(...)` — this helper is not for
  * them, and a review rule of thumb is: `boundedWindow` may only be
  * applied after an aggregation whose key set is grid-like.
  */
object BoundedWindows {

  /** `Window.orderBy` over an input already reduced to a bounded grid
    * (see object scaladoc).
    */
  def boundedWindow(cols: Column*): WindowSpec = Window.orderBy(cols: _*)

  /** String-column variant of [[boundedWindow]]. */
  def boundedWindow(colName: String, more: String*): WindowSpec =
    Window.orderBy(colName, more: _*)

  /** Drop the single-partition WindowExec warning to ERROR for the
    * whole `org.apache.spark.sql.execution.window` logger namespace.
    * For sessions whose only global-order windows are the bounded-grid
    * ones above, the warning is pure noise at ~1 line per window per
    * job — in round 11 it buried the one real error in a 3,000-line
    * bench log. Driver mains (Bench/Verify/PairSweep) call this after
    * `setLogLevel`; library users who mix in their own unbounded
    * windows should not.
    */
  def quietWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
}
