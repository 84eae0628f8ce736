package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.{Pipeline, Scd2}

/** End-to-end P2+P3 on the reference's own daily extract
  * (`daily/data_matkinh_daily_2024-12-08_…csv`, 200 rows): ingest,
  * null-fill, dedup, two-day SCD2 with a mutated day-2 snapshot
  * (the shipped day-2 file is byte-identical — FIXTURES A1), date-dim
  * FK backfill.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dailyCsv =
    "/root/reference/daily/data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"
  private val d1 = Date.valueOf("2024-12-08")
  private val d2 = Date.valueOf("2024-12-09")

  private lazy val day1 =
    Pipeline.ingestDaily(spark, dailyCsv, idConfig = 1, d1, d1).cache()

  test("P2 ingest: 200 raw rows -> 100 unique keys, typed, null-filled") {
    // the shipped feed contains every product twice (scrape bug B1 side
    // effect) - exactly why the reference dedups (A1): 200 -> 100
    assert(day1.count() === 100)
    val r = day1.filter(col("sku") === "TF-1850 56 C03").head()
    assert(r.getAs[Int]("price") === 7900000) // trailing space in feed
    assert(r.getAs[String]("natural_key") === "TITANTEC TF-1850-TF-1850 56 C03")
    assert(r.getAs[Int]("quantity_available") === 4)
    // null-fill leaves no nulls anywhere
    val nullCounts = day1.select(Pipeline.trackedCols.map(c =>
      sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*).head()
    assert(nullCounts.toSeq.forall(_ == 0))
    // dedup: natural_key unique
    assert(day1.groupBy("natural_key").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("P3 SCD2 two-day flow with mutated day 2 + date-dim backfill") {
    val dw0 = Pipeline.emptyDw(spark)
    val snap1 = Pipeline.snapshotOf(day1, 1, d1)
    val dw1 = Pipeline.loadToDw(dw0, snap1, d1).cache()
    assert(dw1.count() === 100)
    assert(dw1.filter(col("dt_last_update") =!= lit(Scd2.Sentinel)).isEmpty)

    // synthesize day 2: bump price on 3 keys, drop 1 key, add 1 key
    val keys = day1.select("natural_key").orderBy("natural_key")
      .limit(5).collect().map(_.getString(0))
    val changed = keys.take(3)
    val dropped = keys(3)
    val day2 = day1
      .filter(col("natural_key") =!= dropped)
      .withColumn("price",
        when(col("natural_key").isin(changed: _*), col("price") + 1000)
          .otherwise(col("price")))
      .withColumn("dt_extract", lit(d2))
      .withColumn("dt_load", lit(d2))
      .unionByName(day1.limit(1)
        .withColumn("natural_key", lit("NEW-KEY"))
        .withColumn("sku", lit("NEW-SKU"))
        .withColumn("dt_extract", lit(d2))
        .withColumn("dt_load", lit(d2)))

    val dw2 = Pipeline.loadToDw(dw1,
      Pipeline.snapshotOf(day2, 1, d2), d2).cache()

    // 100 day-1 versions + 3 new versions of changed + 1 brand-new key
    assert(dw2.count() === 104)
    // exactly one open version per present key; dropped key stays open
    val opens = dw2.filter(col("dt_last_update") === lit(Scd2.Sentinel))
    assert(opens.count() === 101)
    assert(opens.groupBy("natural_key").count()
      .filter(col("count") > 1).isEmpty)
    assert(!opens.filter(col("natural_key") === dropped).isEmpty)
    // changed keys: old version closed at d2, new open version at d2
    changed.foreach { k =>
      val versions = dw2.filter(col("natural_key") === k)
        .orderBy("dt_load_to_dw").collect()
      assert(versions.length === 2)
      assert(versions(0).getAs[Date]("dt_last_update") === d2)
      assert(versions(1).getAs[Date]("dt_last_update") === Scd2.Sentinel)
      assert(versions(1).getAs[Int]("price") ===
        versions(0).getAs[Int]("price") + 1000)
    }
    // J5 backfill: every row has a dt_dim matching its dt_extract
    assert(dw2.filter(col("dt_dim").isNull).isEmpty)
    val dim = graft.dim.DateDim.generate(spark)
      .select(col("id"), col("full_date"))
    val mismatch = dw2.join(dim, dw2("dt_dim") === dim("id"))
      .filter(col("dt_extract") =!= col("full_date"))
    assert(mismatch.isEmpty)

    // idempotence: re-merging day 2 changes nothing
    val dw2again = Pipeline.loadToDw(dw2,
      Pipeline.snapshotOf(day2, 1, d2), d2)
    assert(dw2again.exceptAll(dw2).isEmpty && dw2.exceptAll(dw2again).isEmpty)
  }
}
