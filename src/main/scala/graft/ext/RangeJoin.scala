package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range/interval join — a join class the reference never needs (its SQL
  * is all equi-joins, SURVEY §2.3 "Not present in the reference") but any
  * analytics engine must offer: match each POINT row to every half-open
  * INTERVAL `[lo, hi)` containing it.
  *
  * Spark plans a raw `p >= lo AND p < hi` theta join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons, which
  * is fine for a handful of intervals but fatal when both sides scale
  * (100 TB of events × millions of windows). The scale shape here is the
  * classic BUCKETIZATION rewrite:
  *
  *   1. each point maps to ONE coarse bucket `floor(p / w)`;
  *   2. each interval replicates to EVERY bucket it overlaps
  *      (`floor(lo/w) .. floor((hi-1)/w)` — at most `len/w + 1` rows);
  *   3. equi-join on the bucket key, then re-check the exact predicate.
  *
  * Because a point lives in exactly one bucket, every matching
  * (point, interval) pair meets in exactly one joined row — no DISTINCT
  * pass is needed afterwards. Cost: one shuffle on the bucket key (vs no
  * shuffle but quadratic work for the nested loop), interval-side blowup
  * bounded by `len/w + 1`. Pick `w` near the TYPICAL interval length:
  * replication stays O(1) per interval while each bucket only sees
  * intervals that could plausibly match. Bucket-key skew follows point
  * skew and is AQE-splittable (the key is synthetic and fine-grained).
  */
object RangeJoin {

  /** Floor division of a (possibly negative) long column by a positive
    * width. Double division is exact here: both operands are integers far
    * below 2^53 and IEEE division is correctly rounded, so an integral
    * quotient comes out exactly integral.
    */
  private def fdiv(c: Column, w: Long): Column =
    floor(c.cast("double") / lit(w.toDouble)).cast("long")

  /** Join `points` to every interval of `intervals` whose `[lo, hi)`
    * range contains the point. Output columns: all point columns + all
    * interval columns (callers project). `pointCol`, `loCol`, `hiCol`
    * must be integral (epoch seconds, ids, …); empty intervals
    * (`hi <= lo`) match nothing and are dropped up front.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val pts = points.withColumn("__bucket", fdiv(col(pointCol), bucketWidth))
    val ivs = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(loCol), bucketWidth),
          fdiv(col(hiCol) - lit(1L), bucketWidth))))
    pts.join(ivs, Seq("__bucket")).drop("__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
  }

  /** [[pointInInterval]] with the bucket width DERIVED from the data: the
    * median interval length via one tiny aggregate over the interval side
    * (`approx_percentile` — bounded memory, one pass, merge-safe at any
    * scale). The median is the robust center under skewed interval mixes:
    * a mean would let a few huge windows (a "whole-year" interval among
    * millions of minutes) inflate `w` until every bucket sees every short
    * interval, while the median keeps replication ≈ O(1) per TYPICAL
    * interval and outliers pay their own `len/w` replication — bounded,
    * and only for the rows that are genuinely wide.
    *
    * Width only shapes the PLAN (replication vs bucket fan-in), never the
    * match set — any positive width yields identical results — so the
    * approximation is free of correctness risk; pass an explicit width
    * via the main overload when the workload is known better.
    *
    * NOTE: this overload runs an EAGER Spark action (the width aggregate)
    * at call time, and the `intervals` lineage is then evaluated a second
    * time by the join itself. When `intervals` is an expensive uncached
    * computation, either `.persist()` it first or compute a width once
    * and call the explicit-width overload.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String,
                      hiCol: String): DataFrame =
    pointInInterval(points, intervals, pointCol, loCol, hiCol,
      autoBucketWidth(intervals, loCol, hiCol))

  /** Median interval length, floored to ≥ 1; empty/degenerate interval
    * sets fall back to width 1 (nothing to replicate anyway).
    */
  def autoBucketWidth(intervals: DataFrame, loCol: String,
                      hiCol: String): Long = {
    val row = intervals.filter(col(hiCol) > col(loCol))
      .agg(approx_percentile((col(hiCol) - col(loCol)).cast("long"),
        lit(0.5), lit(10000)).as("med"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Interval–interval OVERLAP join: every pair (left, right) whose
    * half-open ranges intersect (`a.lo < b.hi ∧ b.lo < a.hi`). The
    * missing sibling of [[pointInInterval]] — concurrent sessions,
    * conflicting bookings, SCD2 validity clashes.
    *
    * Same bucketization as the point join, with one twist: BOTH sides
    * replicate, so an overlapping pair can meet in several buckets. A
    * DISTINCT would shuffle the whole pair set again; instead each pair
    * is EMITTED exactly once, in the bucket that contains the overlap's
    * start `max(a.lo, b.lo)` — a map-side predicate on values already
    * in the row, so the output needs no dedup pass at all. Replication
    * stays `len/w + 1` per interval per side; the join is an equi-join
    * on the synthetic bucket key (shuffle, AQE-splittable skew).
    *
    * Output: all left columns + all right columns (callers project and
    * may add their own `id_l < id_r` guard for self-joins).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      loL: String, hiL: String, loR: String, hiR: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val l = left.filter(col(hiL) > col(loL))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(loL), bucketWidth),
          fdiv(col(hiL) - lit(1L), bucketWidth))))
    val r = right.filter(col(hiR) > col(loR))
      .withColumn("__bucket",
        explode(sequence(fdiv(col(loR), bucketWidth),
          fdiv(col(hiR) - lit(1L), bucketWidth))))
    l.join(r, Seq("__bucket"))
      .filter(col(loL) < col(hiR) && col(loR) < col(hiL))
      // emit exactly once: only the bucket holding the overlap start
      .filter(fdiv(greatest(col(loL), col(loR)), bucketWidth) ===
        col("__bucket"))
      .drop("__bucket")
  }
}
