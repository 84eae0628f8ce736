package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.JoinEliminate

/** Redundant-join elimination on declared unique keys: fires exactly on
  * (left-outer ∧ unique right key ∧ only-left columns consumed), never
  * otherwise, and never changes results when it fires.
  */
class JoinEliminateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val customer =
    Tables.load(spark, TestSpark.sf0001, "customer")
  private lazy val nation = Tables.load(spark, TestSpark.sf0001, "nation")

  private def withRule[A](keys: String)(f: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ JoinEliminate
    spark.conf.set(JoinEliminate.ConfKey, keys)
    try f finally {
      spark.conf.unset(JoinEliminate.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == JoinEliminate)
    }
  }

  private def joined = customer
    .join(nation, customer("c_nationkey") === nation("n_nationkey"),
      "left_outer")
    .select(col("c_custkey"), col("c_name"), col("c_acctbal"))

  test("left-outer join to a declared-unique dim key is eliminated when " +
       "only left columns are consumed — and the result is unchanged") {
    val without = joined.collect().map(_.toSeq).toSet
    withRule("n_nationkey,r_regionkey") {
      val q = joined
      assert(!q.queryExecution.optimizedPlan.toString.contains("Join"),
        "the dim join must be gone from the optimized plan")
      assert(q.collect().map(_.toSeq).toSet === without,
        "elimination must be semantics-preserving")
    }
  }

  test("the rule declines: inner join (needs RI, not just uniqueness), " +
       "undeclared key, right-column reference, or empty conf") {
    withRule("n_nationkey") {
      val inner = customer
        .join(nation, customer("c_nationkey") === nation("n_nationkey"))
        .select(col("c_custkey"))
      assert(inner.queryExecution.optimizedPlan.toString.contains("Join"),
        "inner joins filter unmatched rows — never eliminated")

      val rightCol = customer
        .join(nation, customer("c_nationkey") === nation("n_nationkey"),
          "left_outer")
        .select(col("c_custkey"), col("n_name"))
      assert(rightCol.queryExecution.optimizedPlan.toString
        .contains("Join"), "a consumed right column defeats the rewrite")
    }
    withRule("some_other_key") {
      assert(joined.queryExecution.optimizedPlan.toString.contains("Join"),
        "undeclared keys are not assumed unique")
    }
    withRule("") {
      assert(joined.queryExecution.optimizedPlan.toString.contains("Join"),
        "empty conf disables the rule")
    }
  }

  test("non-unique right side would change cardinality — the rule only " +
       "trusts the declaration, so an undeclared duplicate-key join " +
       "stays put and keeps its duplicates") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val dup = Seq((1, "x"), (1, "y")).toDF("k2", "rv")
    val q = left.join(dup, left("k") === dup("k2"), "left_outer")
      .select(col("k"), col("lv"))
    withRule("") {
      assert(q.count() === 3L, "duplicate right keys fan out")
    }
  }
}
