package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Clean

/** F1–F7/A1 cleaning pipeline against the reference's own sample rows
  * (`daily/data_matkinh_daily_2024-12-08_kinhmatviettin.vn.csv` shapes,
  * SURVEY §2.5).
  */
class CleanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F1 normalizePrice strips currency marks and keeps leading segment") {
    val df = Seq("189,000,000₫", "1,250,000₫/hộp", "250000", " 9,500 ₫ ")
      .toDF("p")
    val out = df.select(Clean.normalizePrice($"p").as("v"))
      .as[Long].collect()
    assert(out.toSeq === Seq(189000000L, 1250000L, 250000L, 9500L))
  }

  test("F2 naturalKey concatenates name-sku; null sku degrades gracefully") {
    val df = Seq(("Kính A", "SKU1"), ("Kính B", null))
      .toDF("product_name", "sku")
    val out = df.select(Clean.naturalKey($"product_name", $"sku").as("k"))
      .as[String].collect()
    assert(out.toSeq === Seq("Kính A-SKU1", "Kính B"))
  }

  test("F4 digitsOnly keeps digits, defaults 0 (null included)") {
    val df = Seq("12 chiếc", "abc", "", null).toDF("q")
    val out = df.select(Clean.digitsOnly($"q").as("v")).collect().map(_.get(0))
    assert(out.toSeq === Seq(12L, 0L, 0L, 0L))
  }

  test("F5 keywordField + firstToken parse bullet-delimited descriptions") {
    val desc = "Mã sản phẩm: ABC123 • Chất liệu: Nhựa dẻo • Xuất xứ: Việt Nam"
    val df = Seq(desc).toDF("d")
    val row = df.select(
      Clean.keywordField($"d", "Mã sản phẩm").as("sku"),
      Clean.keywordField($"d", "Chất liệu").as("material"),
      Clean.firstToken(Clean.keywordField($"d", "Xuất xứ")).as("origin"))
      .head()
    assert(row.getString(0) === "ABC123")
    assert(row.getString(1) === "Nhựa dẻo")
    assert(row.getString(2) === "Việt")
  }

  test("F3 nullFill: strings→N/A, numerics→-1") {
    val df = Seq((Some("x"), Some(5)), (None, None))
      .toDF("brand", "price")
    val out = Clean.nullFill(df, Seq("brand"), Seq("price"))
      .orderBy(desc("brand")).collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ===
      Seq(("x", 5), ("N/A", -1)))
  }

  test("A1 dedupFirst keeps exactly one first row per key") {
    val df = Seq(
      ("k1", 1, "a"), ("k1", 2, "b"), ("k2", 5, "c"), ("k2", 3, "d"))
      .toDF("natural_key", "seq", "payload")
    val out = Clean.dedupFirst(df, Seq("natural_key"), Seq($"seq".asc))
      .orderBy("natural_key")
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq === Seq(("k1", "a"), ("k2", "d")))
  }
}
