package graft.runner

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.control.ControlPlane
import graft.control.ControlPlane._
import graft.etl.Pipeline
import graft.sources.Sources

/** E2'/E3' — the reference's per-day staging + warehouse runs
  * (`load_to_staging.py:478-564`, `load_to_dw.py:491-560`) composed from
  * the pure pipeline functions and the control plane: guard → log RUNNING
  * → work → log success, with EF + alert on failure. Scraping (E1) stays
  * outside the engine by design (SURVEY §2.1 S1/S2) — ingest starts at
  * the landed CSV.
  */
object DailyJob {

  final case class State(staging: DataFrame, dw: DataFrame, log: DataFrame)

  def initial(spark: SparkSession): State =
    State(
      staging = Pipeline.emptyDw(spark)
        .drop("dt_load_to_dw", "dt_last_update"),
      dw = Pipeline.emptyDw(spark),
      log = ControlPlane.emptyLog(spark))

  private def logEntry(id: Long, config: FileConfig, day: Date,
                       status: String, count: Long, nowMs: Long,
                       fileSizeKb: Long = 0L) =
    RunLogEntry(id, config.id, s"data_${config.id}_" +
      s"${config.destinationTableStaging}_${day}_${config.source}.csv",
      day, status, count, fileSizeKb, new Timestamp(nowMs))

  /** Stage 1 (E1'): landed CSV → lake landing zone. The scrape itself
    * stays outside the engine (SURVEY §2.1 S1/S2); E1' picks up at the
    * scraper's CSV exactly where `extract_file.py:443-532` does — guard
    * (skip if the day is RUNNING/ES), mark RUNNING, validate + count the
    * rows, upload to the landing location (any Hadoop FS scheme — the B2
    * bucket upload analogue), then mark ES with row count and size KB;
    * any failure marks EF and alerts.
    *
    * @return (state, Some(landedPath)) on success / skip-already-done,
    *         (state, None) on guard-skip or failure.
    */
  def runExtract(state: State, config: FileConfig, sourceCsv: String,
                 landingDir: String, day: Date,
                 alerter: Alerter = NoopAlerter,
                 nowMs: Long = 0L): (State, Option[String]) = {
    if (!canExtract(state.log, config.id, day)) {
      alerter.alert(s"extract skipped ${config.id}/$day",
        "day already RUNNING or extracted")
      return (state, None)
    }
    val running = upsert(state.log,
      logEntry(day.toLocalDate.toEpochDay, config, day, Status.Running,
        0L, nowMs))
    val spark = state.staging.sparkSession
    try {
      val rows = Sources.readCsv(spark, sourceCsv,
        Pipeline.feedSchema, header = true).count()
      val landed = s"$landingDir/data_${config.id}_" +
        s"${config.destinationTableStaging}_${day}_${config.source}.csv"
      Sources.copyFile(spark, sourceCsv, landed)
      val (_, sizeKb) = Sources.fileStats(spark, landed)
      val done = upsert(running,
        logEntry(day.toLocalDate.toEpochDay, config, day,
          Status.ExtractSuccess, rows, nowMs + 1,
          math.round(sizeKb)))
      (State(state.staging, state.dw, done), Some(landed))
    } catch {
      case e: Exception =>
        alerter.alert(s"extract failed ${config.id}/$day", Option(e.getMessage).getOrElse(e.toString))
        (State(state.staging, state.dw, upsert(running,
          logEntry(day.toLocalDate.toEpochDay, config, day,
            Status.ExtractFailure, 0L, nowMs + 1))), None)
    }
  }

  /** Stage 2: landed CSV → staging. Guard: the extract must have
    * succeeded (ES); failures mark EF and alert instead of throwing raw.
    */
  def runStaging(state: State, config: FileConfig, csvPath: String,
                 day: Date, alerter: Alerter = NoopAlerter,
                 nowMs: Long = 0L): State = {
    if (!readyForStaging(state.log, config.id, day)) {
      alerter.alert(s"staging skipped ${config.id}/$day",
        "no ES row - extract has not succeeded")
      return state
    }
    val running = upsert(state.log,
      logEntry(day.toLocalDate.toEpochDay, config, day, Status.Running,
        0L, nowMs))
    try {
      val spark = state.staging.sparkSession
      val ingested = Pipeline.ingestDaily(spark, csvPath, config.id, day, day)
      val staged = state.staging.unionByName(ingested)
      val done = upsert(running,
        logEntry(day.toLocalDate.toEpochDay, config, day,
          Status.LoadedStaging, ingested.count(), nowMs + 1))
      State(staged, state.dw, done)
    } catch {
      case e: Exception =>
        alerter.alert(s"staging failed ${config.id}/$day", Option(e.getMessage).getOrElse(e.toString))
        State(state.staging, state.dw, upsert(running,
          logEntry(day.toLocalDate.toEpochDay, config, day,
            Status.ExtractFailure, 0L, nowMs + 1)))
    }
  }

  /** Stage 3: staging slice → SCD2 warehouse. Guard: staging must have
    * loaded (LS).
    */
  def runWarehouse(state: State, config: FileConfig, day: Date,
                   alerter: Alerter = NoopAlerter,
                   nowMs: Long = 0L): State = {
    if (!readyForDw(state.log, config.id, day)) {
      alerter.alert(s"dw skipped ${config.id}/$day",
        "no LS row - staging has not loaded")
      return state
    }
    try {
      val snapshot = Pipeline.snapshotOf(state.staging, config.id, day)
      val dw = Pipeline.loadToDw(state.dw, snapshot, day)
      val done = upsert(state.log,
        logEntry(day.toLocalDate.toEpochDay, config, day,
          Status.LoadedWarehouse, dw.count(), nowMs + 2))
      State(state.staging, dw, done)
    } catch {
      case e: Exception =>
        alerter.alert(s"dw failed ${config.id}/$day", Option(e.getMessage).getOrElse(e.toString))
        State(state.staging, state.dw, upsert(state.log,
          logEntry(day.toLocalDate.toEpochDay, config, day,
            Status.ExtractFailure, 0L, nowMs + 2)))
    }
  }

  /** Stage 4 (P4'): SCD2 warehouse → star-schema mart — the stage the
    * reference SCHEDULES as S6 ("load_to_dm.py", architecture.drawio
    * page 1; docx §2.2's per-stage schedule) but never shipped. Guard:
    * the warehouse load must have succeeded (LWS); success marks LDM
    * with the fact row count; failure marks EF and alerts, same
    * state-machine convention as E1'–E3'.
    *
    * The star's snapshot window is `[from, until]`; `attrCols` /
    * `measures` split the warehouse payload into dimension attributes vs
    * fact measures (see [[graft.mart.Mart.build]]).
    *
    * @return (state, Some(star)) on success, (state, None) on guard-skip
    *         or failure. The star's pinned warehouse snapshot is released
    *         via `star.unpersist()` once its members are consumed.
    */
  def runMart(state: State, config: FileConfig, day: Date,
              attrCols: Seq[String], measures: Seq[String],
              from: Date, until: Date,
              alerter: Alerter = NoopAlerter,
              nowMs: Long = 0L): (State, Option[graft.mart.Mart.Star]) = {
    if (!readyForMart(state.log, config.id, day)) {
      alerter.alert(s"mart skipped ${config.id}/$day",
        "no LWS row - warehouse has not loaded")
      return (state, None)
    }
    val running = upsert(state.log,
      logEntry(day.toLocalDate.toEpochDay, config, day, Status.Running,
        0L, nowMs))
    try {
      val spark = state.dw.sparkSession
      val star = graft.mart.Mart.build(spark, state.dw, attrCols,
        measures, from, until)
      // count forces the build (and the pinned dw materialization): a
      // broken star must fail HERE, on the RUNNING row, not later in the
      // consumer with LDM already marked
      val factRows = star.fact.count()
      val done = upsert(running,
        logEntry(day.toLocalDate.toEpochDay, config, day,
          Status.LoadedMart, factRows, nowMs + 3))
      (State(state.staging, state.dw, done), Some(star))
    } catch {
      case e: Exception =>
        // Mart.build pins state.dw (persist returns the same instance)
        // and can throw after pinning — either in build itself or at the
        // forcing count — so release the pin on THE WAREHOUSE FRAME, not
        // a star we may never have received; otherwise every failed mart
        // run leaves another snapshot cached for the rest of the session
        state.dw.unpersist()
        alerter.alert(s"mart failed ${config.id}/$day",
          Option(e.getMessage).getOrElse(e.toString))
        (State(state.staging, state.dw, upsert(running,
          logEntry(day.toLocalDate.toEpochDay, config, day,
            Status.ExtractFailure, 0L, nowMs + 3))), None)
    }
  }
}
