package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dim.DateDim

/** Golden test: the generated reference-parity calendar must equal the
  * reference's own data artifact `/root/reference/date_dim.csv`
  * row-for-row across all 20 columns and 7 671 rows (SURVEY §2.8 — the
  * CSV is the oracle; `insert_date_dim.py` is broken, SURVEY B4).
  */
class DateDimGoldenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val goldenSchema =
    "id LONG, full_date DATE, day_of_month LONG, month LONG, " +
      "day_name STRING, month_name STRING, year LONG, " +
      "start_of_week STRING, day_of_week LONG, day_of_year LONG, " +
      "iso_week LONG, iso_week_year STRING, start_of_iso_week DATE, " +
      "iso_week_alt LONG, iso_week_year_alt STRING, start_of_iso_alt DATE, " +
      "quarter STRING, quarter_num LONG, holiday_flag STRING, " +
      "is_weekend STRING"

  test("referenceParity equals date_dim.csv on all 20 columns") {
    val golden = spark.read.schema(goldenSchema)
      .csv("/root/reference/date_dim.csv")
    val gen = DateDim.referenceParity(spark)

    assert(gen.count() === 7671L)
    assert(gen.columns.toSeq === golden.columns.toSeq)

    val extra = gen.exceptAll(golden)
    val missing = golden.exceptAll(gen)
    assert(extra.isEmpty,
      s"generated rows absent from CSV, e.g. ${extra.take(3).mkString("; ")}")
    assert(missing.isEmpty,
      s"CSV rows absent from generated, e.g. ${missing.take(3).mkString("; ")}")
  }

  test("generate(): dense ids, one open row per date, sane ISO fields") {
    val d = DateDim.generate(spark)
    assert(d.count() === 7671L)
    // id is the dense day index (no window needed, scale-safe)
    assert(d.filter(col("id") =!=
      datediff(col("full_date"), lit("2005-01-01").cast("date")) + 1)
      .isEmpty)
    // spot-check the documented boundary row (date_dim.csv:1)
    val r = d.filter(col("full_date") === lit("2005-01-01")).head()
    assert(r.getAs[String]("day_name") === "Saturday")
    assert(r.getAs[String]("iso_week_year") === "2004-W53")
    assert(r.getAs[String]("is_weekend") === "Weekend")
  }
}
