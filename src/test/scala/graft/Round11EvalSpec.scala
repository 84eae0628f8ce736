package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 causal/capacity family
  * (q260–q263) that the oracle hash can't express.
  */
class Round11EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q260: stratum weights sum to 1 over the kept strata and the " +
       "weighted diffs compose the ATE") {
    val rows = run("q260_stratified_ate")
      .select("w", "diff", "wdiff").collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getDouble(0)).sum
    assert(math.abs(wsum - 1.0) < 1e-9,
      s"weights must sum to 1 over kept strata, got $wsum")
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(0) * r.getDouble(1))
        < 1e-12)
    }
  }

  test("q261: peaks are positive, bounded by open intervals, and " +
       "carry-in never exceeds the previous day's starts") {
    val rows = run("q261_peak_concurrency")
      .select("day", "n_starts", "carry_in", "peak_concurrent")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, starts, carry, peak) =>
      assert(peak >= 1L && peak <= starts + carry,
        "peak must lie in [1, starts + carry]")
      assert(carry >= 0L)
    }
    rows.sliding(2).foreach {
      case Array((d1, starts1, _, _), (d2, _, carry2, _))
        if d2 == d1 + 1 =>
        assert(carry2 <= starts1,
          "carry-in is a subset of yesterday's started windows")
      case _ => ()
    }
  }

  test("q262: jackknife SE is non-negative and theta_bar stays within " +
       "the bucket-theta envelope") {
    val r = run("q262_jackknife_ratio_se").head()
    assert(r.getLong(0) > 1L)
    assert(r.getDouble(3) >= 0.0)
    // the jackknife mean of leave-one-out ratios should sit near the
    // full-sample ratio for a well-behaved metric
    assert(math.abs(r.getDouble(1) - r.getDouble(2)) <
      10 * (r.getDouble(3) + 1e-9))
  }

  test("q263: Wilson bounds bracket the point rate inside [0, 1] and " +
       "step counts are monotone") {
    val rows = run("q263_funnel_wilson")
      .select("step", "n_prev", "n_next", "p", "wilson_lo", "wilson_hi")
      .collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val (np, nn) = (r.getLong(1), r.getLong(2))
      val (p, lo, hi) =
        (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nn <= np, "funnel counts must be monotone non-increasing")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= p && p <= hi)
    }
  }
}
