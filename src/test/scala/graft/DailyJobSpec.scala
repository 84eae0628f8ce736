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

  test("E1'→E2'→E3' end-to-end: RUNNING → ES → LS → LWS from one CSV") {
    val a = new CollectingAlerter
    val landing = java.nio.file.Files
      .createTempDirectory("graft_landing").toString
    val s0 = DailyJob.initial(spark)

    val (s1, landedOpt) =
      DailyJob.runExtract(s0, cfg, dailyCsv, landing, day, a)
    val landed = landedOpt.getOrElse(fail("extract must land the file"))
    assert(landed.contains(
      "data_1_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"))
    val esRow = s1.log.filter(col("status") === Status.ExtractSuccess)
    assert(esRow.count() === 1)
    // raw feed rows (the reference logs the extract's CSV row count;
    // keyed dedup to 100 happens at staging, not extract)
    assert(esRow.head.getAs[Long]("count") === 200)
    assert(esRow.head.getAs[Long]("fileSizeKb") > 0)

    // re-running the same day is guarded off (C3) and alerts
    val (s1again, none) = DailyJob.runExtract(s1, cfg, dailyCsv, landing,
      day, a)
    assert(none.isEmpty)
    assert(a.sent.exists(_._1.contains("extract skipped")))

    // monotone nowMs across stages, as a real scheduler provides — the
    // run-log upsert is latest-wins by dtUpdate
    val s2 = DailyJob.runStaging(s1again, cfg, landed, day, a, nowMs = 10)
    assert(s2.staging.count() === 100)
    assert(s2.log.filter(col("status") === Status.LoadedStaging).count() === 1)

    val s3 = DailyJob.runWarehouse(s2, cfg, day, a, nowMs = 20)
    assert(s3.dw.count() === 100)
    assert(s3.log.filter(col("status") === Status.LoadedWarehouse).count() === 1)
    // one row per (config, day): the upsert kept latest-wins through all
    // four states
    assert(s3.log.count() === 1)

    // a FULLY LOADED day must still refuse re-extraction: the LWS row
    // replaced the ES row, and a guard probing only {RUNNING, ES} would
    // re-arm the pipeline and double-ingest the day
    val (s4, refused) = DailyJob.runExtract(s3, cfg, dailyCsv, landing,
      day, a, nowMs = 30)
    assert(refused.isEmpty)
    assert(s4.log.filter(col("status") === Status.LoadedWarehouse)
      .count() === 1, "log must still read LWS")

    // but an EF day IS re-extractable (the retry path)
    val efDay = Date.valueOf("2024-12-09")
    val (sEf, none2) = DailyJob.runExtract(s4, cfg, "/nonexistent.csv",
      landing, efDay, a, nowMs = 40)
    assert(none2.isEmpty)
    val (sRetry, retried) = DailyJob.runExtract(sEf, cfg, dailyCsv,
      landing, efDay, a, nowMs = 50)
    assert(retried.nonEmpty, "EF day must allow a retry extract")
  }

  test("full E1'→P4' chain: LWS gates the mart; success marks LDM, " +
       "failure marks EF and releases the pinned warehouse") {
    val a = new CollectingAlerter
    val landing = java.nio.file.Files
      .createTempDirectory("graft_landing").toString
    val from = Date.valueOf("2024-12-01")
    val until = Date.valueOf("2024-12-08")
    val attrs = Seq("product_name", "brand", "material")
    val measures = Seq("price", "quantity_available")

    // mart before the warehouse has loaded: guard-skip, no RUNNING row
    val s0 = DailyJob.initial(spark)
    val (sSkip, noStar) = DailyJob.runMart(s0, cfg, day, attrs, measures,
      from, until, a)
    assert(noStar.isEmpty)
    assert(sSkip.log.isEmpty, "guard-skip must not write a RUNNING row")
    assert(a.sent.exists(_._1.contains("mart skipped")))

    // the real chain: extract → staging → warehouse → mart
    val (s1, landed) = DailyJob.runExtract(s0, cfg, dailyCsv, landing, day, a)
    val s2 = DailyJob.runStaging(s1, cfg, landed.get, day, a, nowMs = 10)
    val s3 = DailyJob.runWarehouse(s2, cfg, day, a, nowMs = 20)
    val (s4, star) = DailyJob.runMart(s3, cfg, day, attrs, measures,
      from, until, a, nowMs = 30)
    assert(star.nonEmpty, "mart must build after LWS")
    val ldm = s4.log.filter(col("status") === Status.LoadedMart)
    assert(ldm.count() === 1)
    // versions become valid on the Dec-8 load day, so exactly one day of
    // the [Dec 1, Dec 8] window overlaps: 100 products × 1 snapshot date
    assert(ldm.head.getAs[Long]("count") === 100)
    assert(star.get.fact.count() === 100)
    star.get.unpersist()

    // mart-stage failure AFTER LWS: a bad attribute column makes
    // Mart.build throw — the LWS→RUNNING→EF transition must land, the
    // alert must fire, and the warehouse pin taken before the throw must
    // be released (not accumulate across failed runs)
    val efDay = day // same day: LDM blocks re-runs, so rebuild from LWS
    val sLws = s3 // state with LWS, no mart yet
    val (sFail, noStar2) = DailyJob.runMart(sLws, cfg, efDay,
      Seq("no_such_column"), measures, from, until, a, nowMs = 40)
    assert(noStar2.isEmpty)
    assert(sFail.log.filter(col("status") === Status.ExtractFailure)
      .count() === 1)
    assert(a.sent.exists(_._1.contains("mart failed")))
    assert(sFail.dw.storageLevel ===
      org.apache.spark.storage.StorageLevel.NONE,
      "failed mart run must release the pinned warehouse snapshot")

    // an LDM day refuses another mart run (idempotence guard)
    val (sAgain, noStar3) = DailyJob.runMart(s4, cfg, day, attrs, measures,
      from, until, a, nowMs = 50)
    assert(noStar3.isEmpty)
    assert(sAgain.log.filter(col("status") === Status.LoadedMart)
      .count() === 1, "LDM row must survive the refused re-run")
  }

  test("extract failure marks EF with alert content; file transport " +
       "records it durably") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_alerts")
    val alertFile = s"$tmp/alerts.jsonl"
    val alerter = alerterFromEnv(Map(
      "GRAFT_ALERT_TRANSPORT" -> "file", "GRAFT_ALERT_FILE" -> alertFile))
    val landing = java.nio.file.Files
      .createTempDirectory("graft_landing").toString

    val (s1, none) = DailyJob.runExtract(DailyJob.initial(spark), cfg,
      "/nonexistent/feed.csv", landing, day, alerter)
    assert(none.isEmpty)
    assert(s1.log.filter(col("status") === Status.ExtractFailure)
      .count() === 1)
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(alertFile))
    assert(lines.size === 1)
    assert(lines.get(0).contains("extract failed 1/2024-12-08"))

    assert(alerterFromEnv(Map.empty) === NoopAlerter)
    intercept[IllegalArgumentException] {
      alerterFromEnv(Map("GRAFT_ALERT_TRANSPORT" -> "pigeon"))
    }
  }

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
