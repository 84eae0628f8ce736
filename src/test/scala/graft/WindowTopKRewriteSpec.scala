package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{TopKPerKey, WindowTopKRewrite}

/** The optimizer rewrite must turn the row_number-window + rank filter
  * pattern into the heap operator without changing results.
  */
class WindowTopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def windowTopK() = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.load(spark, TestSpark.sf0001, "orders")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
  }

  test("rewrites window top-k to the heap operator, results unchanged") {
    val reference = windowTopK().collect().toSet // rule not installed yet

    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKey.TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    try {
      val rewritten = windowTopK()
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerKey ["), s"rule did not fire:\n$plan")
      assert(!plan.contains("WindowExec") && !plan.contains("Window "))
      assert(rewritten.collect().toSet === reference)

      // shapes the rule must NOT touch: rank used without a limit filter
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
      val untouched = Tables.load(spark, TestSpark.sf0001, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") > 2) // not a top-k pattern
      assert(untouched.queryExecution.executedPlan.toString
        .contains("Window"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == WindowTopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies
          .filterNot(_ == TopKPerKey.TopKStrategy)
    }
  }

  test("global top-n (empty PARTITION BY) is left to WindowExec, not crashed") {
    def globalTopN() = {
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.load(spark, TestSpark.sf0001, "orders")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select("o_orderkey", "o_totalprice", "rank")
    }
    val reference = globalTopN().collect().toSet

    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ TopKPerKey.TopKStrategy
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ WindowTopKRewrite
    try {
      val result = globalTopN() // must plan AND run without error
      val plan = result.queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey ["),
        s"rule must not fire on empty PARTITION BY:\n$plan")
      assert(result.collect().toSet === reference)
      assert(result.count() === 10)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == WindowTopKRewrite)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies
          .filterNot(_ == TopKPerKey.TopKStrategy)
    }
  }

  test("topKPerKey rejects an empty key list eagerly") {
    val df = Tables.load(spark, TestSpark.sf0001, "orders")
    val e = intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(df, Nil,
        Seq(TopKPerKey.Sort("o_totalprice", asc = false)), 3)
    }
    assert(e.getMessage.contains("at least one key"))
  }
}
