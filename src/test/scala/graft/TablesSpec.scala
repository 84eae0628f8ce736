package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract on the testdata boundary.
  *
  * Round-8 lesson: the driver regenerated `/root/testdata` with
  * `events.ts` as parquet TIMESTAMP(MICROS) where the old files were
  * TIMESTAMP(NANOS), and the loader's hard-coded nanos assumption
  * surfaced as 22 cryptic per-query analysis failures. This spec pins
  * the post-`Tables.load` schema of every table so the next data-drift
  * fails HERE, in one assertion naming the table and column.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** (column, Spark simpleString type) per table, post-load. */
  private val contract: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq(
      "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq(
      "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq(
      "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
      "s_acctbal" -> "double"),
    "part" -> Seq(
      "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders" -> Seq(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts is normalized to session-tz TimestampType by Tables.loadEvents
    // regardless of the on-disk encoding — downstream unix_micros(ts)
    // callers reject NTZ.
    "events" -> Seq(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  test("all 10 tables load with the pinned schema at sf0.001") {
    val diffs = Tables.all.flatMap { t =>
      val got = Tables.load(spark, TestSpark.sf0001, t)
        .schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
      val want = contract(t)
      if (got == want) Nil
      else {
        val g = got.toMap; val w = want.toMap
        val cols = (w.keySet ++ g.keySet).toSeq.sorted.flatMap { c =>
          (w.get(c), g.get(c)) match {
            case (a, b) if a == b => None
            case (a, b) =>
              Some(s"$t.$c: expected ${a.getOrElse("<absent>")}, " +
                s"got ${b.getOrElse("<absent>")}")
          }
        }
        if (cols.nonEmpty) cols
        else Seq(s"$t: column order drifted — got ${got.map(_._1).mkString(",")}")
      }
    }
    assert(diffs.isEmpty, s"\nschema contract violations:\n  ${diffs.mkString("\n  ")}")
  }

  test("loadEvents dispatches on the on-disk ts encoding") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-events-enc").toString

    // Plain UTC TIMESTAMP encoding → pass-through.
    val tsDir = s"$base/ts"
    Seq((1L, Timestamp.from(java.time.Instant.parse("2024-01-02T03:04:05.000006Z")),
         7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tsDir/events.parquet")
    val fromTs = Tables.load(spark, tsDir, "events")
    assert(fromTs.schema("ts").dataType.simpleString === "timestamp")
    assert(fromTs.select(unix_micros($"ts")).as[Long].head() ===
      1704164645000006L)

    // Legacy nanos-as-long encoding → ts div 1000 → timestamp_micros.
    val nanosDir = s"$base/nanos"
    Seq((1L, 1704164645000006000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$nanosDir/events.parquet")
    val fromNanos = Tables.load(spark, nanosDir, "events")
    assert(fromNanos.schema("ts").dataType.simpleString === "timestamp")
    assert(fromNanos.select(unix_micros($"ts")).as[Long].head() ===
      1704164645000006L)

    // The real driver data (currently TIMESTAMP_NTZ micros) → cast is
    // value-preserving under the pinned UTC session timezone: the raw
    // NTZ local datetime equals the normalized UTC instant.
    val real = Tables.load(spark, TestSpark.sf0001, "events")
    val raw = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
    if (raw.schema("ts").dataType.simpleString == "timestamp_ntz") {
      val a = real.select($"event_id", unix_micros($"ts").as("us"))
      val b = raw.select($"event_id",
        unix_micros($"ts".cast("timestamp")).as("us"))
      assert(a.except(b).isEmpty && b.except(a).isEmpty)
    }
  }
}
