package graft

import java.sql.{Date, Timestamp}

import org.scalatest.funsuite.AnyFunSuite

import graft.control.{ControlPlane, JdbcControl}
import graft.control.ControlPlane._
import graft.control.JdbcControl.Conn

/** S8/S9 — control tables over spark.read.jdbc / write.jdbc, exercised
  * against embedded Derby (`jdbc:derby:memory:`), the in-JVM database on
  * Spark's classpath. Production targets the reference's Postgres via
  * [[JdbcControl.jdbcUrl]]; the Spark calls are identical.
  */
class JdbcControlSpec extends AnyFunSuite {
  // keep derby.log / db artifacts out of the repo root
  System.setProperty("derby.system.home", "target/derby")

  private lazy val spark = TestSpark.spark

  private def derby(dbName: String): Conn =
    Conn(s"jdbc:derby:memory:$dbName;create=true",
      driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  private val day = Date.valueOf("2024-12-08")
  private def entry(id: Long, status: String, ts: Long) =
    RunLogEntry(id, 1, "data_1.csv", day, status, 200, 16,
      new Timestamp(ts))

  test("file_config round-trips through JDBC with schema intact") {
    val c = derby("cfgdb")
    val configs = Seq(
      FileConfig(1, "products", "example.com", "/in/products",
        "stg_products", "dw_products", "bkt", "folder", "b1"),
      FileConfig(2, "orders", "example.com", "/in/orders",
        "stg_orders", "dw_orders", "bkt", "folder", "b2"))
    JdbcControl.writeConfigs(spark, configs, c)
    assert(JdbcControl.readConfigs(spark, c) === configs)
  }

  test("run-log upsert over JDBC: latest-wins per (config, day), guards see it") {
    val c = derby("logdb")
    JdbcControl.upsertLog(spark, c, entry(1, Status.Running, 1))
    JdbcControl.upsertLog(spark, c, entry(2, Status.ExtractSuccess, 2))
    val log = JdbcControl.readLog(spark, c)
    assert(log.count() === 1)
    assert(log.head().getAs[String]("status") === Status.ExtractSuccess)
    // the persisted log drives the same stage guards as the DataFrame one
    assert(readyForStaging(log, 1, day))
    assert(!readyForDw(log, 1, day))
    // a second day coexists with the first
    val day2 = Date.valueOf("2024-12-09")
    JdbcControl.upsertLog(spark, c,
      RunLogEntry(3, 1, "data_1.csv", day2, Status.Running, 0, 0,
        new Timestamp(3)))
    assert(JdbcControl.readLog(spark, c).count() === 2)
  }

  test("status equality predicates push into the JDBC scan (VARCHAR, not CLOB)") {
    val c = derby("pushdb")
    JdbcControl.upsertLog(spark, c, entry(1, Status.LoadedStaging, 1))
    val scan = JdbcControl.readLog(spark, c)
      .filter(org.apache.spark.sql.functions.col("status") ===
        Status.LoadedStaging)
    // CLOB-typed status would throw on the comparison inside Derby;
    // VARCHAR via createTableColumnTypes keeps the filter pushable.
    assert(scan.count() === 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("status"),
      s"expected pushed JDBC filter on status:\n$plan")
  }

  test("partitioned JDBC read fans out over range predicates") {
    val c = derby("partdb")
    (1L to 8L).foreach(i =>
      JdbcControl.upsertLog(spark, c,
        RunLogEntry(i, i.toInt, "f.csv", day, Status.Running, 0, 0,
          new Timestamp(i))))
    val df = JdbcControl.readTablePartitioned(spark, c, "file_logs",
      "idConfig", 1L, 9L, 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 8)
  }
}
