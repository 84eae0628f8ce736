package graft.control

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.control.ConfigXml.DbConfig

/** JDBC source/sink for the control tables (SURVEY §2.1 S8/S9).
  *
  * The reference keeps `file_config` / `file_logs` in Postgres and reads
  * them with per-row psycopg2 cursors (`extract_file.py:198-222`,
  * `load_to_staging.py:164-179`); a migrating user touches
  * `spark.read.jdbc` / `df.write.jdbc` first. This module is that
  * surface: schema-preserving round-trips of the control tables through
  * any JDBC database, with the credentials supplied by
  * [[ConfigXml.DbConfig]] (env-first secrets, never embedded).
  *
  * Scale notes:
  *  - Control tables are tiny (hundreds of rows) — single-partition
  *    reads/writes are the right plan; no `partitionColumn` needed.
  *  - DATA tables read over JDBC must use [[readTablePartitioned]] so the
  *    scan fans out over `numPartitions` bounded range predicates instead
  *    of one driver-side cursor; predicates on the partition column are
  *    pushed into each range query by the JDBC source.
  *  - String columns get explicit VARCHAR widths via
  *    `createTableColumnTypes`: several dialects (Derby included) map
  *    StringType to CLOB/TEXT by default, and CLOB columns reject
  *    equality predicates — which would break the status guards' pushed
  *    filters.
  *
  * Tests run against embedded Derby (`jdbc:derby:memory:`), the in-JVM
  * database shipped with Spark; production points the same calls at the
  * reference's Postgres via [[jdbcUrl]].
  */
object JdbcControl {

  /** Connection descriptor. `driver` is auto-detected from the URL by
    * Spark for well-known schemes; Derby embedded needs it explicit.
    */
  final case class Conn(url: String, user: Option[String] = None,
                        password: Option[String] = None,
                        driver: Option[String] = None)

  /** Postgres URL for a reference-config database entry (the reference's
    * `psycopg2.connect(host=..., port=..., dbname=...)` analogue).
    */
  def jdbcUrl(db: DbConfig): String =
    s"jdbc:postgresql://${db.hostname}:${db.port}/${db.database}"

  def conn(db: DbConfig): Conn =
    Conn(jdbcUrl(db), Some(db.username), Some(db.password))

  private def props(c: Conn): Properties = {
    val p = new Properties()
    c.user.foreach(p.setProperty("user", _))
    c.password.foreach(p.setProperty("password", _))
    c.driver.foreach(p.setProperty("driver", _))
    p
  }

  // ── Generic table surface (S8/S9) ───────────────────────────────────

  def readTable(spark: SparkSession, c: Conn, table: String): DataFrame =
    spark.read.jdbc(c.url, table, props(c))

  /** Partitioned JDBC scan for data-sized tables: `numPartitions`
    * parallel range queries on `partitionColumn` (must be numeric/date).
    * This is the 100 TB-safe shape — one cursor per executor task, not
    * one driver cursor.
    */
  def readTablePartitioned(spark: SparkSession, c: Conn, table: String,
                           partitionColumn: String, lowerBound: Long,
                           upperBound: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(c.url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(c))

  def writeTable(df: DataFrame, c: Conn, table: String,
                 mode: SaveMode = SaveMode.Append,
                 columnTypes: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(c.url, table, props(c))
  }

  // ── file_config (C1 storage) ────────────────────────────────────────

  private val ConfigColumnTypes =
    "name VARCHAR(64), source VARCHAR(64), " +
      "sourceFileLocation VARCHAR(256), " +
      "destinationTableStaging VARCHAR(64), " +
      "destinationTableDw VARCHAR(64), bucketName VARCHAR(64), " +
      "folderB2Name VARCHAR(64), bucketId VARCHAR(64)"

  def writeConfigs(spark: SparkSession,
                   configs: Seq[ControlPlane.FileConfig], c: Conn,
                   table: String = "file_config"): Unit = {
    import spark.implicits._
    writeTable(configs.toDF(), c, table, SaveMode.Overwrite,
      Some(ConfigColumnTypes))
  }

  def readConfigs(spark: SparkSession, c: Conn,
                  table: String = "file_config"): Seq[ControlPlane.FileConfig] = {
    import spark.implicits._
    readTable(spark, c, table).as[ControlPlane.FileConfig]
      .collect().toSeq.sortBy(_.id) // control table: hundreds of rows max
  }

  // ── file_logs (D5 storage) ──────────────────────────────────────────

  private val LogColumnTypes =
    "fileName VARCHAR(256), status VARCHAR(8)"

  def writeLog(log: DataFrame, c: Conn,
               table: String = "file_logs"): Unit =
    writeTable(log, c, table, SaveMode.Overwrite, Some(LogColumnTypes))

  def readLog(spark: SparkSession, c: Conn,
              table: String = "file_logs"): DataFrame =
    readTable(spark, c, table)

  /** D5 — the reference UPDATEs the day's log row in place
    * (`load_to_staging.py:543-562`). Over JDBC we read-modify-write the
    * (small) log through [[ControlPlane.upsert]]'s latest-wins window;
    * the table stays the source of truth between engine runs.
    *
    * The current rows are MATERIALIZED (collected) before the overwrite:
    * a lazy plan reading the same JDBC table it is about to overwrite
    * would see the truncated table at execution time and silently drop
    * every prior row. Control logs are tiny by contract, so the collect
    * is a few hundred rows at most.
    */
  def upsertLog(spark: SparkSession, c: Conn,
                entry: ControlPlane.RunLogEntry,
                table: String = "file_logs"): DataFrame = {
    import spark.implicits._
    val current: Seq[ControlPlane.RunLogEntry] =
      if (tableExists(spark, c, table))
        readLog(spark, c, table).as[ControlPlane.RunLogEntry]
          .collect().toSeq
      else Seq.empty
    val updated = ControlPlane.upsert(current.toDF(), entry)
      .as[ControlPlane.RunLogEntry].collect().toSeq
    writeLog(updated.toDF(), c, table)
    updated.toDF()
  }

  def tableExists(spark: SparkSession, c: Conn, table: String): Boolean =
    try { readTable(spark, c, table).schema; true }
    catch { case _: Exception => false }
}
