package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Sketches, Skew}
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

  test("SCD2 merge over same-key bucketed tables plans with zero shuffles") {
    import spark.implicits._
    import java.sql.Date
    val d1 = Date.valueOf("2024-01-01")
    val d2 = Date.valueOf("2024-01-02")
    val dim0 = Seq(("a", 1, "x"), ("b", 2, "y"))
      .toDF("natural_key", "price", "brand")
      .withColumn(
        "dt_load_to_dw", org.apache.spark.sql.functions.lit(d1))
      .withColumn("dt_last_update",
        org.apache.spark.sql.functions.lit(graft.etl.Scd2.Sentinel))
    val snap = Seq(("a", 5, "x"), ("c", 3, "z"))
      .toDF("natural_key", "price", "brand")
    Bucketing.writeBucketed(dim0, "dw_cur_b", "natural_key", 4,
      Seq("natural_key"))
    Bucketing.writeBucketed(snap, "snap_b", "natural_key", 4,
      Seq("natural_key"))

    val prevThreshold =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.etl.Scd2.merge(
        spark.table("dw_cur_b"), spark.table("snap_b"),
        "natural_key", Seq("price", "brand"), d2)
      assert(Bucketing.isShuffleFree(merged),
        "bucketed SCD2 merge should join without an exchange:\n" +
          merged.queryExecution.executedPlan.toString.take(2000))
      // a closed + a' open + b open + c open
      assert(merged.count() === 4)
      assert(merged.filter(col("dt_last_update") ===
        lit(graft.etl.Scd2.Sentinel)).count() === 3)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
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

  test("per-group KMV: exact below k, tight estimate above, planned on " +
       "the custom top-k operator") {
    import spark.implicits._
    // 3 groups: 20, 200, 1000 distinct values (k = 64 splits them)
    val rows = Seq(("a", 20), ("b", 200), ("c", 1000)).flatMap {
      case (g, n) => (0 until n).map(v => (g, s"$g-$v"))
    }
    val df = rows.toDF("grp", "v")
    val out = Sketches.kmvDistinctByGroup(df, "grp", col("v"), 64)
    assert(out.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      "k-minima selection must plan on the custom heap operator")
    val got = out.collect().map(r =>
      r.getAs[String]("grp") ->
        (r.getAs[Long]("k_actual"), r.getAs[Double]("distinct_estimate")))
      .toMap
    assert(got("a") === ((20L, 20.0)), "below k the sketch is exact")
    assert(got("b")._1 === 64L && math.abs(got("b")._2 - 200) / 200.0 < 0.35)
    assert(got("c")._1 === 64L && math.abs(got("c")._2 - 1000) / 1000.0 < 0.35)
  }
}
