package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance — the materialized-view primitive
  * a 100 TB warehouse lives on: instead of re-scanning the full fact for
  * every report, keep a per-key state table of MERGEABLE partials
  * (count + exact decimal sum) and fold each day's delta in. Because
  * decimal addition is associative and commutative, ANY batching of the
  * input folds to bit-identical state — incremental ≡ full recompute,
  * which is exactly what the q97 oracle (a plain GROUP BY over the whole
  * input) verifies. The derived metrics (avg, double totals) are views
  * over the state, computed at read time ([[finish]]).
  *
  * At scale: a delta merge shuffles the DELTA (pre-aggregated map-side),
  * never the state's history; with the state table bucketed by the keys
  * the fold is a co-located merge.
  */
object IncrementalAgg {

  /** Aggregate one batch into mergeable partials. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(valueCol.cast(DecimalType(30, 8))).as("sum_dec"))

  /** Fold a new batch's partials into existing state (same schema). */
  def merge(state: DataFrame, delta: DataFrame,
            keys: Seq[String]): DataFrame =
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_dec")).as("sum_dec"))

  /** Read-time view over the state: exact count, order-independent
    * double total and average (Parity discipline).
    */
  def finish(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(col("n"),
      col("sum_dec").cast("double").as("total"),
      (col("sum_dec").cast("double") / col("n")).as("avg_value")): _*)

  /** RETRACTABLE fold — the CDC/upsert-stream completion of the
    * insert-only merge: (count, decimal sum) form an abelian GROUP,
    * not just a monoid, so a deleted row folds in as its exact inverse
    * (−1, −value) and the state after any interleaving of inserts and
    * deletes bit-equals the recompute over the surviving rows. Keys
    * whose count reaches zero leave the state entirely (a key that was
    * fully retracted is indistinguishable from one never seen —
    * required for the recompute equivalence). Min/max are deliberately
    * NOT in this state: they are monoid-only and would need a per-key
    * rescan on delete; a warehouse keeps them in a separate
    * insert-only view.
    */
  def applyDelta(state: DataFrame, inserts: DataFrame,
                 deletes: DataFrame, keys: Seq[String],
                 valueCol: Column): DataFrame = {
    val ins = partial(inserts, keys, valueCol)
    val del = partial(deletes, keys, valueCol)
      .select(keys.map(col) ++ Seq((-col("n")).as("n"),
        (-col("sum_dec")).as("sum_dec")): _*)
    merge(merge(state, ins, keys), del, keys)
      .filter(col("n") =!= 0)
  }
}
