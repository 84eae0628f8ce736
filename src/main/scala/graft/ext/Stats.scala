package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table-statistics collection — the ANALYZE primitive a cost-based
  * planner feeds on (row counts, null fractions, NDVs, value ranges,
  * means). Complements the KMV join-cardinality estimator
  * ([[Sketches.kmvJoinCardinality]]): that one prices a specific join,
  * this one materializes the per-column profile a planner consults for
  * every scan and filter.
  *
  * One aggregation pass over the table produces every column's stats
  * (Spark expands multi-distinct aggregates internally — still a single
  * scan); the per-column rows are then exploded from an in-row struct
  * array, so the output is |cols| rows regardless of table size.
  *
  * NDV here is EXACT (`count_distinct`) so the oracle replays it; at
  * 100 TB swap in `approx_count_distinct` (HLL) or the KMV sketch — the
  * one-line change trades oracle-exactness for a bounded-memory pass,
  * and the surrounding shape (one scan, tiny output) is unchanged.
  * Means ride exact decimal sums (Parity discipline).
  */
object Stats {

  /** Per-column stats for NUMERIC columns: `column, n, n_null, ndv,
    * min_v, max_v, mean_v` — one output row per requested column.
    */
  def numericColumnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "numericColumnStats with no columns")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        count(lit(1)).as(s"__rows_$c"),
        count_distinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast(DecimalType(30, 8))).cast("double").as(s"__sum_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val packed = one.select(explode(array(cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__rows_$c").as("n"),
        (col(s"__rows_$c") - col(s"__n_$c")).as("n_null"),
        col(s"__ndv_$c").as("ndv"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        (col(s"__sum_$c") / col(s"__n_$c").cast("double")).as("mean_v"))
    }: _*)).as("s"))
    packed.select(col("s.column").as("column"), col("s.n").as("n"),
      col("s.n_null").as("n_null"), col("s.ndv").as("ndv"),
      col("s.min_v").as("min_v"), col("s.max_v").as("max_v"),
      col("s.mean_v").as("mean_v"))
  }
}
