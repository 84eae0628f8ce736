package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerKey

/** The custom physical operator must (1) produce exactly the
  * deterministic row_number()-window result, (2) plan with a single hash
  * exchange and NO sort / window nodes.
  */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val orders = Tables.load(spark, TestSpark.sf0001, "orders")

  test("matches the window row_number formulation exactly") {
    // repartition so the map-side partial pass runs over real splits
    val custom = TopKPerKey.topKPerKey(orders.repartition(7),
      Seq("o_custkey"),
      Seq(TopKPerKey.Sort("o_totalprice", asc = false),
        TopKPerKey.Sort("o_orderkey")), 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rank")

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val reference = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rank")

    assert(custom.exceptAll(reference).isEmpty &&
      reference.exceptAll(custom).isEmpty)
    assert(custom.count() === reference.count())
  }

  test("plans as TopKPerKeyExec with one exchange, no Sort/Window") {
    val df = TopKPerKey.topKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.Sort("o_totalprice", asc = false),
        TopKPerKey.Sort("o_orderkey")), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey ["))
    assert(plan.contains("TopKPerKeyPartial"),
      "map-side combiner pass missing")
    assert(!plan.contains("WindowExec") && !plan.contains("Sort "),
      s"unexpected sort/window in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1)
    // the combiner sits BELOW the exchange (map side)
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(plan.indexOf("TopKPerKeyPartial") > exIdx,
      "partial pass must be below the exchange in the plan tree")
  }

  test("k larger than group size returns whole groups, ranks dense") {
    val df = TopKPerKey.topKPerKey(orders, Seq("o_custkey"),
      Seq(TopKPerKey.Sort("o_orderkey")), 1000)
    assert(df.count() === orders.count())
    val perGroup = df.groupBy("o_custkey")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("maxr"))
    assert(perGroup.filter(col("n") =!= col("maxr")).isEmpty)
  }
}
