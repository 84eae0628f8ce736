package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.control.ControlPlane._
import graft.runner.DailyJob

class DailyJobSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dailyCsv =
    "/root/reference/daily/data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"
  private val day = Date.valueOf("2024-12-08")
  private val cfg = FileConfig(1, "matkinh", "kinhmatviettin.vn",
    "daily", "matkinh_daily", "dw", "bucket", "folder", "b2id")

  private def seedEs(state: DailyJob.State): DailyJob.State =
    state.copy(log = upsert(state.log,
      RunLogEntry(99L, cfg.id, "f.csv", day, Status.ExtractSuccess,
        200, 16, new Timestamp(0L))))

  test("guarded staging + warehouse happy path: ES → LS → LWS") {
    val s0 = seedEs(DailyJob.initial(spark))
    val s1 = DailyJob.runStaging(s0, cfg, dailyCsv, day)
    assert(s1.staging.count() === 100)
    assert(s1.log.filter(col("status") === Status.LoadedStaging).count() === 1)

    val s2 = DailyJob.runWarehouse(s1, cfg, day)
    assert(s2.dw.count() === 100)
    assert(s2.dw.filter(col("dt_dim").isNull).isEmpty)
    assert(s2.log.filter(col("status") === Status.LoadedWarehouse).count() === 1)
  }

  test("staging without ES is skipped with an alert (idempotence guard)") {
    val a = new CollectingAlerter
    val s0 = DailyJob.initial(spark)
    val s1 = DailyJob.runStaging(s0, cfg, dailyCsv, day, a)
    assert(s1.staging.count() === 0)
    assert(a.sent.exists(_._1.contains("staging skipped")))
  }

  test("warehouse without LS is skipped; staging failure marks EF") {
    val a = new CollectingAlerter
    val s0 = seedEs(DailyJob.initial(spark))
    val skipped = DailyJob.runWarehouse(s0, cfg, day, a)
    assert(skipped.dw.count() === 0)
    assert(a.sent.exists(_._1.contains("dw skipped")))

    val bad = DailyJob.runStaging(s0, cfg, "/nonexistent/file.csv", day, a)
    assert(bad.log.filter(col("status") === Status.ExtractFailure)
      .count() === 1)
    assert(a.sent.exists(_._1.contains("staging failed")))
  }
}
