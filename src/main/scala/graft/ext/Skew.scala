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

  /** Salt-replicated inner equi-join for a skewed LEFT side: `left` rows
    * get a deterministic salt in [0, `salts`), `right` is replicated once
    * per salt value, and the join runs on (key, salt) — a hot key's rows
    * spread over `salts` reduce tasks instead of one straggler holding a
    * double-digit share of the shuffle.
    *
    * Exact: each left row carries exactly one salt and every right row
    * exists under every salt, so the matched pairs are identical to the
    * plain join's. The salt derives from `saltSource` (an existing
    * uniform-ish column, e.g. the row id) — deterministic under task
    * retry, unlike a `rand()` salt. Cost: `right` is scanned once and
    * exploded ×`salts` through the shuffle — use when `right` is too big
    * to broadcast but far smaller than `left` (else AQE skew-join or
    * [[hotKeySplitJoin]]).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, salts: Int): DataFrame = {
    require(salts > 0, s"salts $salts")
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key split inner equi-join: rows whose key is in `hotKeys` join
    * against a BROADCAST of the (few) matching right rows — no shuffle
    * can straggle on them — while the cold remainder takes the normal
    * shuffled join. Exact for inner equi-joins (a null key matches
    * nothing on either path, same as the plain join).
    *
    * This is the surgical variant of [[saltedJoin]] when the hot set is
    * known (from `observeBuckets`-style stats or a prior count): the
    * right side is NOT replicated and the cold path's plan is untouched.
    */
  def hotKeySplitJoin(left: DataFrame, right: DataFrame, key: String,
                      hotKeys: Seq[Any]): DataFrame = {
    require(hotKeys.nonEmpty, "hotKeySplitJoin with no hot keys")
    val isHot = col(key).isin(hotKeys: _*)
    val hot = left.filter(isHot)
      .join(broadcast(right.filter(isHot)), Seq(key))
    val cold = left.filter(!isHot).join(right.filter(!isHot), Seq(key))
    hot.unionByName(cold)
  }
}
