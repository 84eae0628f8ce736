package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Skew
import graft.sources.Bucketing

/** Scale features: bucketed co-located joins (no exchange in the plan)
  * and salted aggregation (same results, bounded reducers).
  */
class ScaleFeaturesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("joining two tables bucketed on the key needs no shuffle") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val customer = Tables.load(spark, TestSpark.sf0001, "customer")
    Bucketing.writeBucketed(orders, "orders_b", "o_custkey", 4,
      Seq("o_custkey"))
    Bucketing.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", "o_custkey", 4, Seq("o_custkey"))

    val joined = Bucketing.table(spark, "orders_b")
      .join(Bucketing.table(spark, "customer_b").hint("merge"), "o_custkey")
    assert(Bucketing.isShuffleFree(joined),
      s"bucketed join should not shuffle:\n" +
        joined.queryExecution.executedPlan.toString.take(2000))
    // and it still computes the right thing
    val expected = orders.join(
      customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    assert(joined.count() === expected.count())
  }

  test("salted aggregation equals plain aggregation") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val salted = Skew.saltedAgg(ev, Seq("event_type"), col("event_id"),
      col("value"), salts = 8)
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("value").cast("double")).as("total"))
    val diff = salted.alias("s").join(plain.alias("p"), "event_type")
      .filter(col("s.n") =!= col("p.n") ||
        abs(col("s.total") - col("p.total")) > 1e-6)
    assert(diff.isEmpty)
    assert(salted.count() === plain.count())
  }
}
