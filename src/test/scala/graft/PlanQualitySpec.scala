package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the scale properties the operators are
  * designed around must be visible in the physical plan, not just
  * claimed: filter pushdown + column pruning at the scan, broadcast
  * joins for small dims, no cartesian products on the ANN paths, and the
  * one-pass SCD2 merge (2 scans, not 8).
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q02: filters pushed to the parquet scan, columns pruned") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "expected pushed filters at the scan")
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(p).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads more columns than projected: $readSchema")
  }

  test("q03: dimension joins broadcast; no sort-merge join") {
    val p = plan("q03_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("ANN paths never fall back to a cartesian product") {
    Seq("q31_ann_bucketed", "q37_ann_ivf", "q29_embed_dups").foreach { q =>
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cross join")
    }
  }

  test("q30 brute force broadcasts the probe side only") {
    assert(plan("q30_ann_bruteforce").contains("BroadcastNestedLoopJoin"))
  }

  test("q15 SCD2 merge scans each input once (one-pass merge)") {
    assert("Scan parquet".r.findAllIn(plan("q15_scd2")).length === 2)
  }

  test("q01 aggregation has a map-side partial phase") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), "expected partial aggregation")
  }
}
