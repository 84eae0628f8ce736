package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-pipeline re-expression of the reference's row-at-a-time cleaning
  * (SURVEY §2.5 F1–F7). Every function is a pure `Column` expression —
  * codegen'd, null-safe, and fully distributed (the reference did these in
  * per-row Python: `load_to_staging.py:154-216`, `extract_file.py:39-95`).
  */
object Clean {

  /** F1 — price normalization: keep the segment before '/', strip currency
    * marks and thousand separators, cast to long.
    * Reference: `extract_file.py:47-52`.
    */
  def normalizePrice(priceText: Column): Column =
    regexp_replace(split(priceText, "/").getItem(0), "[₫,\\s]", "")
      .cast("long")

  /** F2 — natural key `product_name-sku`. Reference: `load_to_staging.py:172`. */
  def naturalKey(productName: Column, sku: Column): Column =
    concat_ws("-", productName, sku)

  /** F4 — digit filter: keep digits only, default 0.
    * Reference: `extract_file.py:78-83`.
    */
  def digitsOnly(c: Column): Column =
    coalesce(nullif(regexp_replace(c, "[^0-9]", ""), lit("")), lit("0"))
      .cast("long")

  /** F5 — keyword field parse: extract the value following `label:` up to
    * the next '•' bullet. Reference: `extract_file.py:62-76,140-144`.
    */
  def keywordField(desc: Column, label: String): Column =
    trim(regexp_extract(desc, s"$label:([^•]*)", 1))

  /** F5 (origin variant) — first whitespace token of the parsed field. */
  def firstToken(c: Column): Column = split(trim(c), "\\s+").getItem(0)

  /** F3 — typed null replacement: strings → "N/A", numerics → -1.
    * Reference: `load_to_staging.py:204-216`.
    */
  def nullFill(df: DataFrame, stringCols: Seq[String],
               numCols: Seq[String]): DataFrame =
    df.na.fill("N/A", stringCols).na.fill(-1, numCols)

  /** A1 — dedup keeping the first row per key under `order`.
    * The reference keeps MIN(ctid) per natural_key
    * (`load_to_staging.py:220-227`); ctid order is physical/arbitrary, so
    * any deterministic tie-break preserves intent. Window + row_number
    * shuffles once on the key — at 100 TB prefer pre-bucketed input on the
    * same key so the shuffle is elided.
    */
  def dedupFirst(df: DataFrame, key: Seq[String],
                 order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
