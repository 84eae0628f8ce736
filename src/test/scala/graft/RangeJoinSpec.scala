package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.RangeJoin

/** Bucketized point-in-interval join: exact match set vs a brute-force
  * theta join, boundary semantics, duplicate-free output across bucket
  * widths, and the plan shape (equi-join, not a nested loop).
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def points = Seq(0L, 5L, 10L, 15L, 99L, 100L, 101L, 250L)
    .toDF("pt").withColumn("pid", col("pt"))
  private def intervals = Seq(
    (1L, 0L, 10L),     // [0,10): catches 0,5
    (2L, 10L, 11L),    // [10,11): catches 10
    (3L, 5L, 200L),    // wide: catches 5..101
    (4L, 100L, 100L),  // empty
    (5L, 240L, 260L))  // catches 250
    .toDF("iid", "lo", "hi")

  private def bruteForce: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("matches brute-force theta join across bucket widths") {
    for (w <- Seq(1L, 3L, 7L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
        "pt", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet === bruteForce, s"wrong match set at w=$w")
    }
  }

  test("half-open boundaries: lo inclusive, hi exclusive, empty dropped") {
    val got = RangeJoin.pointInInterval(points, intervals,
      "pt", "lo", "hi", 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got.contains((0L, 1L)), "lo must be inclusive")
    assert(!got.contains((10L, 1L)), "hi must be exclusive")
    assert(!got.exists(_._2 == 4L), "empty interval must match nothing")
  }

  test("negative domains floor-divide correctly") {
    val p = Seq(-25L, -20L, -1L, 0L).toDF("pt")
    val iv = Seq((1L, -21L, 0L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, iv, "pt", "lo", "hi", 10L)
      .select("pt").as[Long].collect().toSet
    assert(got === Set(-20L, -1L))
  }

  test("auto width: median length, robust to skewed interval mixes") {
    // 99 one-minute windows + 1 whole-year window: the mean (~5256) would
    // replicate nothing and melt one bucket; the median stays at the
    // typical length.
    val skewed = ((1 to 99).map(i => (i.toLong, i * 100L, i * 100L + 60L)) :+
      (100L, 0L, 31536000L)).toDF("iid", "lo", "hi")
    val w = RangeJoin.autoBucketWidth(skewed, "lo", "hi")
    assert(w === 60L, s"median of 99×60s + 1×1y must be 60, got $w")
    // degenerate interval sets fall back to width 1
    val empty = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(RangeJoin.autoBucketWidth(empty, "lo", "hi") === 1L)
    assert(RangeJoin.autoBucketWidth(
      Seq((1L, 5L, 5L)).toDF("iid", "lo", "hi"), "lo", "hi") === 1L)
    // and the auto-width overload returns the exact match set
    val got = RangeJoin.pointInInterval(points, intervals, "pt", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect()
    assert(got.length === got.toSet.size)
    assert(got.toSet === bruteForce)
  }

  test("plans as an equi-join on the bucket key, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
      "pt", "lo", "hi", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join must not be a nested loop:\n$plan")
  }

  test("intervalOverlap: matches brute force across widths, exactly " +
       "once per pair, half-open boundaries, negative domains") {
    val left = Seq(
      (1L, 0L, 10L), (2L, 5L, 6L), (3L, -25L, -3L), (4L, 100L, 200L),
      (5L, 7L, 7L)) // empty: overlaps nothing
      .toDF("lid", "lo_l", "hi_l")
    val right = Seq(
      (10L, 9L, 12L),   // overlaps 1 only ([9,10) ∩ [0,10) ≠ ∅)
      (11L, 10L, 20L),  // touches 1 at the boundary: NO overlap
      (12L, -5L, 1L),   // overlaps 3 and 1
      (13L, 150L, 151L),// inside 4
      (14L, 5L, 6L))    // equals 2, inside 1
      .toDF("rid", "lo_r", "hi_r")
    val brute = left.crossJoin(right)
      .filter(col("lo_l") < col("hi_r") && col("lo_r") < col("hi_l") &&
        col("hi_l") > col("lo_l") && col("hi_r") > col("lo_r"))
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(brute === Set((1L, 10L), (1L, 12L), (1L, 14L), (3L, 12L),
      (4L, 13L), (2L, 14L)))
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.intervalOverlap(left, right,
        "lo_l", "hi_l", "lo_r", "hi_r", w)
        .select("lid", "rid").as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"pair emitted more than once at w=$w")
      assert(got.toSet === brute, s"wrong overlap set at w=$w")
    }
  }
}
