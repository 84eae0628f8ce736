package graft

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** The library must tolerate concurrent query submission on one shared
  * session — multiple notebook users / scheduler threads is the normal
  * cluster deployment. Exercises the mutable touchpoints: strategy
  * registration, function registration, temp-view creation (q44/q48),
  * and plain query execution.
  */
class ConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("eight queries submitted from parallel threads all succeed") {
    val names = Seq("q54_topk_custom_op", "q03_region_revenue",
      "q44_grouping_sets", "q48_subqueries", "q16_topk",
      "q54_topk_custom_op", "q08_window_topn", "q42_distinct_agg")
    val futures = names.map { n =>
      Future {
        graft.functions.GraftFunctions.register(spark)
        n -> SparkEntry.queries(n)(spark, TestSpark.sf0001).count()
      }
    }
    val results = Await.result(Future.sequence(futures), 300.seconds)
    results.foreach { case (n, c) => assert(c > 0, s"$n returned no rows") }
    // the strategy was registered exactly once despite racing callers
    assert(spark.experimental.extraStrategies
      .count(_ == graft.plans.TopKPerKey.TopKStrategy) === 1)
  }
}
