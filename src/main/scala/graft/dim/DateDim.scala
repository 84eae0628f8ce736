package graft.dim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native calendar-dimension generation (SURVEY §2.8) replacing the
  * reference's CSV load (`insert_date_dim.py` — which is broken, SURVEY
  * B4; `date_dim.csv` spans 2005-01-01 → 2026-01-01, 7 671 rows).
  *
  * `sequence + explode` generates the frame in one task per year-range
  * split; every attribute is a deterministic function of `full_date`, so
  * the whole thing is codegen'd projection — no shuffle except the final
  * surrogate-key window (which a calendar this small never needs to scale).
  */
object DateDim {

  def generate(spark: SparkSession,
               start: String = "2005-01-01",
               end: String = "2026-01-01"): DataFrame = {
    val base = spark.sql(
      s"SELECT explode(sequence(DATE'$start', DATE'$end')) AS full_date")
    base
      .withColumn("day_of_month", dayofmonth(col("full_date")).cast("long"))
      .withColumn("month", month(col("full_date")).cast("long"))
      .withColumn("day_name", date_format(col("full_date"), "EEEE"))
      .withColumn("month_name", date_format(col("full_date"), "MMMM"))
      .withColumn("year", year(col("full_date")).cast("long"))
      .withColumn("start_of_week", date_format(col("full_date"), "yyyy-MMM"))
      .withColumn("day_of_year", dayofyear(col("full_date")).cast("long"))
      .withColumn("iso_week", weekofyear(col("full_date")).cast("long"))
      // ISO week-year via the Thursday rule: the ISO year of a date is the
      // calendar year of the Thursday in its ISO week (handles the
      // '2004-W52' boundary rows at the top of date_dim.csv).
      .withColumn("iso_week_year",
        concat(
          year(date_add(date_trunc("week", col("full_date")).cast("date"), 3))
            .cast("string"),
          lit("-W"),
          lpad(weekofyear(col("full_date")).cast("string"), 2, "0")))
      .withColumn("start_of_iso_week",
        date_trunc("week", col("full_date")).cast("date"))
      .withColumn("quarter",
        concat(year(col("full_date")).cast("string"), lit("-Q"),
          lpad(quarter(col("full_date")).cast("string"), 2, "0")))
      .withColumn("quarter_num", quarter(col("full_date")).cast("long"))
      .withColumn("holiday_flag", lit("Non-Holiday"))
      .withColumn("is_weekend",
        when(dayofweek(col("full_date")).isin(1, 7), "Weekend")
          .otherwise("Weekday"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("full_date"))).cast("long"))
  }
}
