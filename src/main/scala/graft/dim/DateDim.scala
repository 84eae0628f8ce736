package graft.dim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Native calendar-dimension generation (SURVEY §2.8) replacing the
  * reference's CSV load (`insert_date_dim.py` — which is broken, SURVEY
  * B4; `date_dim.csv` spans 2005-01-01 → 2026-01-01, 7 671 rows).
  *
  * `sequence + explode` generates the frame in one map stage; every
  * attribute is a deterministic function of `full_date`, so the whole
  * thing is codegen'd projection with NO shuffle anywhere — the surrogate
  * id is `datediff(full_date, start) + 1` (equals the reference's serial
  * id because the calendar is dense), not a global window.
  */
object DateDim {

  /** Engine-facing calendar: conventional semantics (real day-of-month,
    * quarter-of-year, ISO weeks).
    */
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
        (datediff(col("full_date"), lit(start).cast("date")) + 1).cast("long"))
  }

  /** Reference-parity calendar: reproduces `/root/reference/date_dim.csv`
    * column-for-column (golden-tested against all 7 671 rows). The CSV's
    * actual semantics diverge from its docx §7 column names:
    *
    *  - `day_of_month` / `month` / `quarter_num` hold RUNNING indexes from
    *    the calendar start (row 7671 = `7671,253,85`), not day-of-month /
    *    month-of-year / quarter-of-year;
    *  - `iso_week`/`iso_week_year`/`start_of_iso_week` are Sunday-start
    *    weeks whose year rolls over on the first Sunday STRICTLY after
    *    Jan 1 — equivalently anchored on the Saturday before the week
    *    starts: week-year = year(start−1), week = ceil(doy(start−1)/7).
    *    2005-01-01 ⇒ `52,2004-W52,2004-12-26` (date_dim.csv:1) and
    *    2006-01-01 (a Sunday) ⇒ `53,2005-W53,2006-01-01`
    *    (date_dim.csv:366);
    *  - `iso_week_alt`/`start_of_iso_alt` are ISO 8601 Monday-start week
    *    numbers (Thursday rule) — 2005-01-01 ⇒ `53, start 2004-12-27` —
    *    but `iso_week_year_alt`'s YEAR is the calendar year of the week's
    *    Monday, not the ISO year: the week of 2007-12-31 is labeled
    *    `2007-W01` (date_dim.csv:1095), duplicating the label of the week
    *    of 2007-01-01 (date_dim.csv:731). Reference-generator quirk,
    *    replicated faithfully;
    *  - `day_of_week` actually holds DAY-OF-MONTH (date_dim.csv:32-40:
    *    February restarts it at 1).
    */
  def referenceParity(spark: SparkSession,
                      start: String = "2005-01-01",
                      end: String = "2026-01-01"): DataFrame = {
    val d = col("full_date")
    // Week starts under each convention.
    val sundayStart = date_sub(d, dayofweek(d) - 1)                // Sun=1
    val mondayStart = date_trunc("week", d).cast("date")
    // Each variant reduces to one anchor day whose calendar year owns the
    // week and whose day-of-year positions it: week = ceil(doy(anchor)/7).
    // Monday variant (true ISO 8601): anchor = Thursday of the week.
    // Sunday variant: anchor = the Saturday BEFORE the week starts (the
    // year rolls over on the first Sunday strictly after Jan 1).
    def weekNum(anchor: Column): Column =
      (((dayofyear(anchor) - 1) / 7).cast("long") + 1)
    def weekLabel(anchor: Column): Column =
      concat(year(anchor).cast("string"), lit("-W"),
        lpad(weekNum(anchor).cast("string"), 2, "0"))
    val sat = date_sub(sundayStart, 1)
    val thu = date_add(mondayStart, 3)

    spark.sql(
      s"SELECT explode(sequence(DATE'$start', DATE'$end')) AS full_date")
      .select(
        (datediff(d, lit(start).cast("date")) + 1).cast("long").as("id"),
        d.as("full_date"),
        (datediff(d, lit(start).cast("date")) + 1).cast("long")
          .as("day_of_month"),
        ((year(d) - year(lit(start).cast("date"))) * 12 + month(d))
          .cast("long").as("month"),
        date_format(d, "EEEE").as("day_name"),
        date_format(d, "MMMM").as("month_name"),
        year(d).cast("long").as("year"),
        date_format(d, "yyyy-MMM").as("start_of_week"),
        dayofmonth(d).cast("long").as("day_of_week"),  // sic: holds DOM
        dayofyear(d).cast("long").as("day_of_year"),
        weekNum(sat).as("iso_week"),
        weekLabel(sat).as("iso_week_year"),
        sundayStart.as("start_of_iso_week"),
        weekNum(thu).as("iso_week_alt"),
        concat(year(mondayStart).cast("string"), lit("-W"),
          lpad(weekNum(thu).cast("string"), 2, "0")).as("iso_week_year_alt"),
        mondayStart.as("start_of_iso_alt"),
        concat(year(d).cast("string"), lit("-Q"),
          lpad(quarter(d).cast("string"), 2, "0")).as("quarter"),
        ((year(d) - year(lit(start).cast("date"))) * 4 + quarter(d))
          .cast("long").as("quarter_num"),
        lit("Non-Holiday").as("holiday_flag"),
        when(dayofweek(d).isin(1, 7), "Weekend").otherwise("Weekday")
          .as("is_weekend"))
  }
}
