package graft

import java.sql.Date

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.control.ControlPlane._
import graft.etl.Scd2
import graft.mart.Mart
import graft.runner.DailyJob

/** P4' mart build: surrogate-key contracts, star integrity, snapshot-fact
  * semantics, and the E1'→E2'→E3'→P4' chain — the warehouse the daily
  * runner produces feeds the mart build directly.
  */
class MartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val attrs = Seq("product_name", "brand")
  private val measures = Seq("price", "quantity_available")

  /** Two-version toy dw: key A changes price on day 10, key B never
    * changes.
    */
  private def toyDw = {
    val d0 = Seq(
      ("A", "prod a", "b1", 10L, 5L),
      ("B", "prod b", "b2", 20L, 7L))
      .toDF("natural_key", "product_name", "brand", "price",
        "quantity_available")
      .withColumn("dt_load_to_dw", lit(Date.valueOf("2021-03-01")))
      .withColumn("dt_last_update", lit(Scd2.Sentinel))
    val snap2 = Seq(
      ("A", "prod a", "b1", 99L, 5L),
      ("B", "prod b", "b2", 20L, 7L))
      .toDF("natural_key", "product_name", "brand", "price",
        "quantity_available")
    Scd2.merge(d0, snap2, "natural_key", attrs ++ measures,
      Date.valueOf("2021-03-10"))
  }

  test("dim_product: one row per version, stable hash surrogate keys, " +
       "is_current marks exactly the open versions") {
    val dim = Mart.dimProduct(toyDw, attrs).cache()
    assert(dim.count() === 3, "A v1 + A v2 + B")
    assert(dim.select("product_sk").distinct().count() === 3)
    assert(dim.filter(col("is_current")).count() === 2)
    assert(dim.filter(!col("is_current"))
      .select("natural_key").as[String].collect().toSeq === Seq("A"))
    // deterministic across rebuilds: re-keying on rewrite would orphan
    // every fact row already written
    val again = Mart.dimProduct(toyDw, attrs)
    assert(dim.select("product_sk").except(again.select("product_sk"))
      .isEmpty)
    // and positive (60-bit md5 prefix in a signed 64-bit column)
    assert(dim.filter(col("product_sk") <= 0).isEmpty)
  }

  test("snapshot fact: each date sees the version valid THAT day; " +
       "open versions capped at the calendar edge") {
    val star = Mart.build(spark, toyDw, attrs, measures,
      Date.valueOf("2021-03-01"), Date.valueOf("2021-03-15"))
    val fact = star.fact.cache()
    // 15 days × 2 products, no version active before 03-01
    assert(fact.count() === 30)
    val aPrices = fact.filter(col("natural_key") === "A")
      .select(col("full_date").cast("string"), col("price"))
      .as[(String, Long)].collect().toMap
    assert(aPrices("2021-03-09") === 10L, "old version on its last day")
    assert(aPrices("2021-03-10") === 99L, "new version from its load day")
    assert(aPrices("2021-03-15") === 99L, "open version through the edge")
    // star joins: every fact row resolves both dimensions exactly once
    assert(fact.join(star.dimProduct, "product_sk").count() === 30)
    assert(fact.join(star.dimDate, "date_sk").count() === 30)
  }

  test("E3' → P4': the runner's warehouse feeds the mart build") {
    val dailyCsv = "/root/reference/daily/" +
      "data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv"
    val day = Date.valueOf("2024-12-08")
    val cfg = FileConfig(1, "matkinh", "kinhmatviettin.vn", "daily",
      "matkinh_daily", "dw", "bucket", "folder", "b2id")
    val landing = java.nio.file.Files
      .createTempDirectory("graft_mart_landing").toString
    val s0 = DailyJob.initial(spark)
    val (s1, landed) = DailyJob.runExtract(s0, cfg, dailyCsv, landing, day)
    val s2 = DailyJob.runStaging(s1, cfg,
      landed.getOrElse(fail("extract must land")), day, nowMs = 10)
    val s3 = DailyJob.runWarehouse(s2, cfg, day, nowMs = 20)
    assert(s3.dw.count() === 100, "warehouse loaded before the mart build")

    val star = Mart.build(spark, s3.dw.drop("dt_dim"),
      graft.etl.Pipeline.stringCols.filterNot(_ == "sku"), measures,
      day, day)
    assert(star.dimProduct.count() === 100)
    assert(star.dimProduct.filter(!col("is_current")).isEmpty,
      "single-day warehouse has only open versions")
    assert(star.fact.count() === 100, "one snapshot row per product")
    // measures survive the star intact: fact totals = warehouse totals
    val dwQty = s3.dw.agg(sum("quantity_available")).head().getLong(0)
    val factQty = star.fact.agg(sum("quantity_available")).head().getLong(0)
    assert(factQty === dwQty)
    assert(star.fact.join(star.dimProduct, "product_sk").count() === 100)
  }
}
