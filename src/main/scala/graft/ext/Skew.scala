package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / the 100 TB checklist: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handling covers joins; for aggregations over
  * pathological key distributions (one key holding a double-digit share
  * of a 100 TB table), two-phase salted aggregation bounds the largest
  * reduce task at 1/`salts` of the hot key.
  */
object Skew {

  /** Two-phase salted aggregation: count + sum per key.
    * Phase 1 groups by (key, salt) — the hot key's rows spread over
    * `salts` reducers; phase 2 folds the partials. Both phases keep
    * map-side partial aggregation; total = 2 small shuffles instead of
    * one shuffle with a straggler task.
    *
    * The salt is `pmod(hash(rand-free row bits), salts)` — derived from
    * a uniform-ish column expression the caller provides (e.g. an id),
    * keeping the operator deterministic and retry-safe (a `rand()` salt
    * would break task-retry idempotence).
    */
  def saltedAgg(df: DataFrame, key: Seq[String], saltSource: Column,
                valueCol: Column, salts: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // decimal partials: two-phase summation is bit-equal to the
    // single-shuffle groupBy (decimal addition is associative, double
    // addition is not) — Parity discipline across the salt split
    val salted = df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val partial = salted
      .groupBy((key.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"),
        sum(valueCol.cast(DecimalType(30, 8))).as("__sum"))
    partial.groupBy(key.map(col): _*)
      .agg(sum(col("__cnt")).as("n"),
        sum(col("__sum")).cast("double").as("total"))
  }
}
