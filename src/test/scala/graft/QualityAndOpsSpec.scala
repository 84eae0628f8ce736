package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Pipeline
import graft.quality.Checks
import graft.quality.Checks._
import graft.sources.Sources

class QualityAndOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dailyCsv =
    "/root/reference/daily/data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"

  test("quality checks: one-pass row checks + uniqueness on the staging load") {
    val d = Date.valueOf("2024-12-08")
    val staged = Pipeline.ingestDaily(spark, dailyCsv, 1, d, d)
    val results = Checks.run(staged, Seq(
      NotNull("natural_key"),
      NotNull("price"),
      InRange("price", -1, 500000000),
      InRange("quantity_available", -1, 100000),
      // the feed's actual origin domain, including the lowercase 'ý'
      // variant the scraper let through
      InSet("origin", Seq("Nhật", "Trung", "Ý", "ý", "Pháp", "Đức", "N/A")),
      Satisfies("url_is_https", col("product_url").startsWith("https://")),
      Unique(Seq("natural_key"))))
    val failed = results.filterNot(_.passed)
    assert(failed.isEmpty, s"failed checks: $failed")
    // and a check that SHOULD fail does
    val bad = Checks.run(staged, Seq(InRange("price", 0, 10)))
    assert(!bad.head.passed && bad.head.failures > 0)
  }

  test("compaction rewrites many small files into few, preserving data") {
    val df = Tables.load(spark, TestSpark.sf0001, "orders")
    val path =
      java.nio.file.Files.createTempDirectory("compact").toString + "/orders"
    df.repartition(24).write.mode("overwrite").parquet(path)
    def fileCount = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(fileCount === 24)
    val before = spark.read.parquet(path)
    val beforeRows = before.count()

    Sources.compact(spark, path, targetMb = 128)
    assert(fileCount === 1) // tiny dataset → one right-sized file
    val after = spark.read.parquet(path)
    assert(after.count() === beforeRows)
    assert(after.exceptAll(df).isEmpty && df.exceptAll(after).isEmpty)
  }

  test("malformed CSV rows: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("badcsv").toString
    val f = s"$dir/feed.csv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      "sku,qty\nA,1\nB,notanumber\nC,3\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sku",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("qty",
        org.apache.spark.sql.types.IntegerType)))

    val permissive = Sources.readCsvWithPolicy(spark, f, schema, "PERMISSIVE")
      .cache()
    assert(permissive.count() === 3)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)

    // collect() reads every column — a bare count() would let CSV column
    // pruning skip parsing `qty`, hiding the malformed row entirely
    val dropped = Sources.readCsvWithPolicy(spark, f, schema, "DROPMALFORMED")
    assert(dropped.collect().length === 2)

    intercept[Exception] {
      Sources.readCsvWithPolicy(spark, f, schema, "FAILFAST").collect()
    }
  }

  test("malformed JSON lines: PERMISSIVE captures, DROPMALFORMED drops, " +
       "FAILFAST throws") {
    val dir = java.nio.file.Files.createTempDirectory("badjson").toString
    val f = s"$dir/feed.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      """{"sku":"A","qty":1}
        |{"sku":"B","qty":"notanumber"}
        |{"sku":"C","qty":3}
        |not json at all
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sku",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("qty",
        org.apache.spark.sql.types.IntegerType)))

    val permissive = Sources.readJsonWithPolicy(spark, f, schema,
      "PERMISSIVE").cache()
    assert(permissive.count() === 4)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 2)
    assert(permissive.filter(col("qty").isNotNull).count() === 2)

    val dropped = Sources.readJsonWithPolicy(spark, f, schema,
      "DROPMALFORMED")
    assert(dropped.collect().length === 2)

    intercept[Exception] {
      Sources.readJsonWithPolicy(spark, f, schema, "FAILFAST").collect()
    }
  }

  test("XML feed: round trip, rowTag selection, and the same malformed " +
       "policy surface as CSV/JSON") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("xmlsrc").toString

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sku",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("qty",
        org.apache.spark.sql.types.IntegerType)))

    // round trip via the native Spark 4 XML source
    val out = Seq(("A", 1), ("B", 2)).toDF("sku", "qty")
    Sources.writeXml(out, s"$dir/rt", "item")
    val back = Sources.readXmlWithPolicy(spark, s"$dir/rt", "item",
      schema, "DROPMALFORMED")
    assert(back.orderBy("sku").collect().map(r =>
      (r.getString(0), r.getInt(1))).toSeq === Seq(("A", 1), ("B", 2)))

    // hand-written feed with one malformed record
    val f = s"$dir/feed.xml"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      """<items>
        |<item><sku>A</sku><qty>1</qty></item>
        |<item><sku>B</sku><qty>notanumber</qty></item>
        |<item><sku>C</sku><qty>3</qty></item>
        |</items>
        |""".stripMargin)
    val permissive = Sources.readXmlWithPolicy(spark, f, "item", schema,
      "PERMISSIVE").cache()
    assert(permissive.count() === 3)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
    assert(permissive.filter(col("qty").isNotNull).count() === 2)

    val dropped = Sources.readXmlWithPolicy(spark, f, "item", schema,
      "DROPMALFORMED")
    assert(dropped.collect().length === 2)

    intercept[Exception] {
      Sources.readXmlWithPolicy(spark, f, "item", schema, "FAILFAST")
        .collect()
    }
  }
}
