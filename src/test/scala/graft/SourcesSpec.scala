package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Pipeline
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dailyCsv =
    "/root/reference/daily/data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"

  test("single-file CSV roundtrip with deterministic name (S3/S6)") {
    val dir = java.nio.file.Files.createTempDirectory("csv_sink").toString
    val dest = s"$dir/data_1_matkinh_daily_2024-12-08_test.csv"
    val df = Sources.readCsv(spark, dailyCsv, Pipeline.feedSchema)
    Sources.writeSingleCsv(df, dest)

    assert(Sources.exists(spark, dest))
    assert(!Sources.exists(spark, s"$dir/nope.csv"))
    val (bytes, kb) = Sources.fileStats(spark, dest)
    assert(bytes > 0 && kb > 0)

    val back = Sources.readCsv(spark, dest, Pipeline.feedSchema)
    assert(back.count() === df.count())
    assert(df.exceptAll(back).isEmpty && back.exceptAll(df).isEmpty)
  }

  test("ORC roundtrip is exact and the scan carries pushed filters + " +
       "a pruned schema") {
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString + "/o"
    Sources.writeOrc(orders, dir)
    val back = Sources.readOrc(spark, dir, orders.schema)
    assert(back.count() === orders.count())
    assert(orders.exceptAll(back).isEmpty && back.exceptAll(orders).isEmpty)
    // pushdown + pruning reach the ORC scan exactly as for parquet
    val q = back.filter(col("o_custkey") === 42)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"),
      s"expected pushed filter at the ORC scan:\n${plan.take(1200)}")
    val readSchema = "ReadSchema: [^\n]+".r.findFirstIn(plan).get
    assert(!readSchema.contains("o_comment"),
      s"ORC scan reads more columns than projected: $readSchema")
  }

  test("sources resolve per-URI FileSystems: cross-scheme copy, probe " +
       "and stats on a non-default scheme (S4/S6)") {
    // Register a second Hadoop FileSystem scheme. Sources.* must resolve
    // the FS from each path's URI (FileSystem.get(uri, conf)) — code that
    // grabs the default FS would read file:// and break on s3a:// in
    // production. An s3a:// path works identically with the recipe in
    // Sources.copyFile's scaladoc; no live object store exists in this
    // container, so the spec proves the multi-scheme plumbing instead.
    spark.sparkContext.hadoopConfiguration.set("fs.graftmem.impl",
      classOf[GraftMemFileSystem].getName)
    val dir = java.nio.file.Files.createTempDirectory("graftmem").toString
    val dest = s"graftmem://$dir/landed/feed.csv"

    assert(!Sources.exists(spark, dest))
    Sources.copyFile(spark, dailyCsv, dest) // file:// → graftmem://
    assert(Sources.exists(spark, dest))
    val (bytes, kb) = Sources.fileStats(spark, dest)
    assert(bytes > 0 && kb > 0)

    val back = Sources.readCsv(spark, dest, Pipeline.feedSchema)
    val orig = Sources.readCsv(spark, dailyCsv, Pipeline.feedSchema)
    assert(back.count() === orig.count())

    val roundtrip = s"graftmem://$dir/roundtrip/out.csv"
    Sources.writeSingleCsv(back, roundtrip) // single-file write on the scheme
    assert(Sources.exists(spark, roundtrip))
    Sources.copyFile(spark, roundtrip, s"$dir/back_local.csv") // → file://
    assert(Sources.exists(spark, s"$dir/back_local.csv"))
  }

  test("warehouse round-trip on an OBJECT-STORE filesystem: flat keys, " +
       "copy+delete rename, distributed parquet job (S4/S5/S6)") {
    // MemObjectStoreFs mimics what s3a actually is — a flat key space
    // with non-atomic rename — so this drives the full DISTRIBUTED
    // write path (Spark job + FileOutputCommitter temporary-directory
    // protocol) against object-store semantics, not a local-FS alias.
    // No hadoop-aws jar exists in this container; with one on the
    // classpath the same calls run unchanged against s3a://.
    MemObjectStoreFs.clear()
    spark.sparkContext.hadoopConfiguration.set("fs.mockobj.impl",
      classOf[MemObjectStoreFs].getName)
    val dw = "mockobj://bucket-a/warehouse/dw"

    assert(!Sources.exists(spark, dw))
    val df = spark.range(0, 1000)
      .selectExpr("id", "CAST(id % 7 AS STRING) AS grp",
        "date_add(DATE '2024-01-01', CAST(id % 3 AS INT)) AS dt_load_to_dw")
    Sources.writeWarehouse(df, dw)
    assert(Sources.exists(spark, dw))

    val back = Sources.readWarehouse(spark, dw)
    assert(back.count() === 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === (0L until 1000L).sum)
    // partition pruning must survive the scheme: one dt partition only
    val one = Sources.readWarehouse(spark, dw)
      .filter(col("dt_load_to_dw") === lit(java.sql.Date.valueOf("2024-01-02")))
    assert(one.count() === 333)

    // daily append lands as an additional partition, no rewrite
    Sources.writeWarehouse(
      spark.range(1000, 1100).selectExpr("id", "'x' AS grp",
        "DATE '2024-01-04' AS dt_load_to_dw"), dw)
    assert(Sources.readWarehouse(spark, dw).count() === 1100)

    // existence probes on flat keys and implicit directories (S5)
    assert(Sources.exists(spark, "mockobj://bucket-a/warehouse"))
    assert(!Sources.exists(spark, "mockobj://bucket-a/nope"))

    // single-file CSV write lands on the scheme too (S3) — its rename
    // is the non-atomic object-store copy+delete
    val csv = "mockobj://bucket-a/exports/feed.csv"
    Sources.writeSingleCsv(df.limit(10).drop("dt_load_to_dw"), csv)
    assert(Sources.exists(spark, csv))
    val (bytes, kb) = Sources.fileStats(spark, csv)
    assert(bytes > 0 && kb > 0)
  }

  test("partitioned warehouse write prunes date-filtered scans") {
    val d1 = Date.valueOf("2024-12-08")
    val day1 = Pipeline.ingestDaily(spark, dailyCsv, 1, d1, d1)
    val dw = Pipeline.loadToDw(Pipeline.emptyDw(spark),
      Pipeline.snapshotOf(day1, 1, d1), d1)

    val path = java.nio.file.Files.createTempDirectory("dw_parts").toString
    Sources.writeWarehouse(dw, path, mode = "overwrite")

    val read = Sources.readWarehouse(spark, path)
      .filter(col("dt_load_to_dw") === lit(d1))
    assert(read.count() === 100)
    // the date filter must become a partition filter, not a data filter
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt_load_to_dw"),
      s"expected partition pruning in:\n$plan")
  }

  test("schema evolution: mergeSchema reads old+new parquet vintages, " +
       "old files surface the added column as null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // vintage 1: (id, a); vintage 2 adds column b
    Seq((1L, "x"), (2L, "y")).toDF("id", "a")
      .write.mode("append").parquet(dir)
    Seq((3L, "z", 30L), (4L, "w", 40L)).toDF("id", "a", "b")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "a", "b"))
    val rows = merged.orderBy("id")
      .select("id", "a", "b").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(2)),
      "old-vintage rows must carry null for the added column")
    assert(rows.drop(2).map(_.getLong(2)).toSeq === Seq(30L, 40L))
    // the programmatic twin: unionByName across vintages in code
    val v1 = spark.createDataFrame(
      Seq((1L, "x")).map(t => (t._1, t._2))).toDF("id", "a")
    val v2 = Seq((3L, "z", 30L)).toDF("id", "a", "b")
    val u = v1.unionByName(v2, allowMissingColumns = true)
    assert(u.columns.toSet === Set("id", "a", "b") && u.count() === 2)
  }
}
