package graft.control

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Control plane (SURVEY §2.9): config lookup, the run-log status state
  * machine, idempotence guards, retry, and alerting — the reference keeps
  * these in two Postgres tables (`file_config`, `file_logs`, docx §9)
  * driven by copy-pasted psycopg2 helpers in each script.
  *
  * Spark-native design: both tables are small DataFrames (parquet/Delta
  * on a cluster); every guard is a filter + isEmpty probe; transitions
  * are validated in the driver (they're control flow, not data flow).
  */
object ControlPlane {

  /** `file_config` row (docx §9; fixture FIXTURES A4). */
  final case class FileConfig(
      id: Int, name: String, source: String, sourceFileLocation: String,
      destinationTableStaging: String, destinationTableDw: String,
      bucketName: String, folderB2Name: String, bucketId: String)

  /** Run-log status domain (docx §3):
    * RUNNING → ES (extract succeeded) → LS (staging loaded) → LWS
    * (warehouse loaded) → LDM (mart loaded); EF = failure from any state.
    *
    * LDM is OUR extension: the reference schedules a P4 mart stage (S6,
    * architecture.drawio page 1) but never shipped `load_to_dm.py`, so
    * its status domain stops at LWS. The designed P4' stage
    * ([[graft.runner.DailyJob]] + [[graft.mart.Mart]]) follows the same
    * lifecycle convention as the shipped stages.
    */
  object Status {
    val Running = "RUNNING"
    val ExtractSuccess = "ES"
    val LoadedStaging = "LS"
    val LoadedWarehouse = "LWS"
    val LoadedMart = "LDM"
    val ExtractFailure = "EF"
    val all: Set[String] =
      Set(Running, ExtractSuccess, LoadedStaging, LoadedWarehouse,
        LoadedMart, ExtractFailure)
  }

  /** Legal transitions of the run-log state machine
    * (`extract_file.py:495-532`, `load_to_staging.py:543-562`,
    * `load_to_dw.py:542-558`; flowcharts drawio pages 2-4).
    */
  val legalTransitions: Set[(String, String)] = {
    import Status._
    Set(
      Running -> ExtractSuccess,
      ExtractSuccess -> Running, // staging re-marks RUNNING while loading
      Running -> LoadedStaging,
      LoadedStaging -> Running, // dw re-marks RUNNING while loading
      Running -> LoadedWarehouse,
      LoadedWarehouse -> Running, // mart re-marks RUNNING while loading
      Running -> LoadedMart,
      Running -> ExtractFailure,
      ExtractSuccess -> ExtractFailure,
      LoadedStaging -> ExtractFailure,
      LoadedWarehouse -> ExtractFailure)
  }

  def transition(from: String, to: String): Either[String, String] =
    if (!Status.all(to)) Left(s"unknown status $to")
    else if (legalTransitions((from, to))) Right(to)
    else Left(s"illegal transition $from -> $to")

  /** `file_logs` row (docx §9). */
  final case class RunLogEntry(
      id: Long, idConfig: Int, fileName: String, time: Date, status: String,
      count: Long, fileSizeKb: Long, dtUpdate: Timestamp)

  def emptyLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[RunLogEntry].toDF()
  }

  /** Upsert by (idConfig, time): the reference UPDATEs the day's row in
    * place (D5); with immutable storage we keep latest-wins by dtUpdate.
    * dtUpdate TIES break by lifecycle progression (RUNNING < ES < LS <
    * LWS < EF), then id — without the rank, two stages logged in the
    * same millisecond (or with the default nowMs) leave the surviving
    * row to partition order, and a rerun's guards go nondeterministic.
    */
  def upsert(log: DataFrame, entry: RunLogEntry): DataFrame = {
    import log.sparkSession.implicits._
    val updated = log.unionByName(Seq(entry).toDF())
    val rank = when(col("status") === Status.Running, 0)
      .when(col("status") === Status.ExtractSuccess, 1)
      .when(col("status") === Status.LoadedStaging, 2)
      .when(col("status") === Status.LoadedWarehouse, 3)
      .when(col("status") === Status.LoadedMart, 4)
      .otherwise(5) // EF: a same-instant failure outranks the success row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("idConfig", "time")
      .orderBy(col("dtUpdate").desc, rank.desc, col("id").desc)
    updated.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ── Idempotence guards (C3) ────────────────────────────────────────
  // The reference's guards are existence probes on the day's log row;
  // note `load_to_staging.py:288-313` names its check "RUNNING or LS"
  // but actually probes status='ES' with an inverted boolean (SURVEY
  // B5) — the INTENT, implemented here, is:
  //   extract runs only if the day hasn't already started/succeeded;
  //   staging runs only if extract succeeded (ES present);
  //   dw runs only if staging succeeded (LS present).

  private def dayRows(log: DataFrame, idConfig: Int, day: Date) =
    log.filter(col("idConfig") === idConfig && col("time") === lit(day))

  /** P3 guard (`extract_file.py:332-362`): extract only if the day has
    * not already started or succeeded. With the single-row-per-(config,
    * day) upsert, "started or succeeded" is ANY non-failure status — the
    * ES row is REPLACED by LS/LWS as later stages run, so probing only
    * {RUNNING, ES} would re-arm extraction on a fully-loaded day and
    * double-ingest it. EF is the one re-extractable state (the retry
    * path).
    */
  def canExtract(log: DataFrame, idConfig: Int, day: Date): Boolean =
    dayRows(log, idConfig, day)
      .filter(col("status").isin(Status.Running, Status.ExtractSuccess,
        Status.LoadedStaging, Status.LoadedWarehouse, Status.LoadedMart))
      .isEmpty

  /** P5 guard, corrected intent of `load_to_staging.py:288-313`. */
  def readyForStaging(log: DataFrame, idConfig: Int, day: Date): Boolean =
    !dayRows(log, idConfig, day)
      .filter(col("status") === Status.ExtractSuccess).isEmpty

  /** P5 guard (`load_to_dw.py:431-456`). */
  def readyForDw(log: DataFrame, idConfig: Int, day: Date): Boolean =
    !dayRows(log, idConfig, day)
      .filter(col("status") === Status.LoadedStaging).isEmpty

  /** P4' guard — same existence-probe shape as the shipped stages: the
    * mart builds only from a day whose warehouse load succeeded (LWS).
    */
  def readyForMart(log: DataFrame, idConfig: Int, day: Date): Boolean =
    !dayRows(log, idConfig, day)
      .filter(col("status") === Status.LoadedWarehouse).isEmpty

  // ── Retry (C4) ─────────────────────────────────────────────────────

  /** Fixed-interval retry — the corrected version of the reference's
    * loop, which NameErrors on its first retry (`extract_file.py:466-480`,
    * SURVEY B2: `attemps` initialized, `attempts` incremented).
    */
  @annotation.tailrec
  def retry[T](attempts: Int, delayMs: Long)(op: () => T): T =
    scala.util.Try(op()) match {
      case scala.util.Success(v) => v
      case scala.util.Failure(e) if attempts <= 1 => throw e
      case scala.util.Failure(_) =>
        Thread.sleep(delayMs)
        retry(attempts - 1, delayMs)(op)
    }

  // ── Alerting (C5) ──────────────────────────────────────────────────

  /** Failure-path alerting. The reference emails via Gmail SMTP with a
    * hardcoded app password in three copy-pasted functions
    * (`extract_file.py:365-394`, SURVEY B6); here it's a trait with
    * injected transport and no embedded secrets.
    */
  trait Alerter { def alert(subject: String, body: String): Unit }

  object NoopAlerter extends Alerter {
    override def alert(subject: String, body: String): Unit = ()
  }

  final class CollectingAlerter extends Alerter {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    override def alert(subject: String, body: String): Unit =
      sent += (subject -> body)
  }

  /** Alerts to stderr — the driver log is the cluster's default
    * operator-visible channel.
    */
  object ConsoleAlerter extends Alerter {
    override def alert(subject: String, body: String): Unit =
      System.err.println(s"[graft-alert] $subject: $body")
  }

  /** Durable alert transport: appends one JSON line per alert to a file
    * (any mounted path; on a cluster, a path a log shipper tails). The
    * reference's transport is Gmail SMTP with an inlined app password
    * (`extract_file.py:365-394`) — an SMTP implementation is this same
    * two-method trait wired to the JVM mail API; it is not included
    * because this container has no mail library and a silent fake SMTP
    * client would be a dishonest test surface.
    */
  final class FileAlerter(path: String) extends Alerter {
    override def alert(subject: String, body: String): Unit = {
      // null-safe: alert() is called from failure handlers with
      // e.getMessage, which is legally null — an NPE HERE would swallow
      // both the alert and the EF bookkeeping that follows it
      def js(raw: String): String = {
        val s = if (raw == null) "" else raw
        "\"" + s.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case c if c < ' ' => f"\\u${c.toInt}%04x"
          case c => c.toString
        } + "\""
      }
      val line = s"""{"ts":${System.currentTimeMillis()},""" +
        s""""subject":${js(subject)},"body":${js(body)}}""" + "\n"
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  }

  /** Transport selection from the environment (C5's deploy knob):
    * `GRAFT_ALERT_TRANSPORT` = `noop` (default) | `console` | `file`
    * (requires `GRAFT_ALERT_FILE`). Unknown transports fail fast — a
    * typo'd transport silently dropping failure alerts is the worst
    * outcome for the one channel that reports failures.
    */
  def alerterFromEnv(env: Map[String, String] = sys.env): Alerter =
    env.getOrElse("GRAFT_ALERT_TRANSPORT", "noop") match {
      case "noop"    => NoopAlerter
      case "console" => ConsoleAlerter
      case "file" => new FileAlerter(env.getOrElse("GRAFT_ALERT_FILE",
        throw new IllegalArgumentException(
          "GRAFT_ALERT_TRANSPORT=file requires GRAFT_ALERT_FILE")))
      case other => throw new IllegalArgumentException(
        s"unknown GRAFT_ALERT_TRANSPORT '$other' " +
          "(expected noop|console|file)")
    }
}
