package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 privacy/mixing family that the
  * oracle hash can't express: apportionment exactness, metric ranges.
  */
class PrivacyBudgetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf0001)

  test("q259: largest-remainder allocations sum EXACTLY to the budget " +
       "and every extra is 0/1") {
    val r = run("q259_temperature_budget")
      .agg(sum("alloc").as("s"), max("extra").as("mx"),
        min("extra").as("mn"), min("alloc").as("mina"))
      .head()
    assert(r.getLong(0) === 100000L)
    assert(r.getLong(1) <= 1L && r.getLong(2) >= 0L)
    assert(r.getLong(3) >= 0L, "no source may receive a negative share")
  }

  test("q257: ordinal EMD is a distance — in [0,1], and the global " +
       "weighted mean CDF gap over groups is bounded by the largest") {
    val rows = run("q257_t_closeness")
      .select("t_emd").collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    assert(rows.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("q256: below_l flags exactly the groups with l_div < 3") {
    val bad = run("q256_l_diversity")
      .filter((col("l_div") < 3) =!= (col("below_l") === 1L))
      .count()
    assert(bad === 0L)
  }

  test("q258: Fleiss kappa and its components stay in range") {
    val r = run("q258_fleiss_kappa").head()
    val (pBar, pE, kappa) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(pBar >= 0.0 && pBar <= 1.0)
    assert(pE >= 0.0 && pE <= 1.0)
    assert(kappa >= -1.0 && kappa <= 1.0)
    // kappa must equal (p_bar - p_e) / (1 - p_e) up to float noise
    assert(math.abs(kappa - (pBar - pE) / (1 - pE)) < 1e-12)
  }
}
