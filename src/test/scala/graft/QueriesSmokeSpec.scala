package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run on sf0.001 and produce rows (the same
  * smoke the driver applies to `SparkEntry.entry`). Oracle-level value
  * checks are the driver's t2 gate (tools/check.py locally).
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle") {
    val noOracle = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.mkString(", ")}")
  }

  SparkEntry.allDefs.foreach { d =>
    test(s"${d.name} runs and returns rows on sf0.001") {
      assert(d.fn(spark, TestSpark.sf0001).count() > 0L)
    }
  }
}
