package graft.etl

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dim.DateDim

/** The reference's P2 (staging load) + P3 (warehouse load) re-expressed as
  * pure DataFrame → DataFrame functions (SURVEY §3 "Our Spark lifecycle
  * replacement").
  *
  * Reference flow:
  *  - P2 `load_to_staging.py:118-188` downloads the daily CSV and INSERTs
  *    row-at-a-time, appending natural_key/id_config/dt_extract/dt_load,
  *    then null-fills and dedups in-database (`:191-245`). Here: ONE
  *    schema-enforced CSV scan + a codegen'd column pipeline.
  *  - P3 `load_to_dw.py:120-150` copies the day's staging slice to
  *    temp_dw, then runs the 4-statement SCD2 merge (`:543-556`). Here:
  *    [[snapshotOf]] + [[Scd2.merge]] + the date-dim FK backfill (J5,
  *    `load_to_dw.py:365-369`) as one broadcast join.
  *
  * Scale notes: the CSV scan parallelizes per file split; everything up
  * to the dedup is map-only; dedup + merge shuffle on natural_key — at
  * 100 TB, bucket `dw` by natural_key so the merge join co-locates.
  */
object Pipeline {

  /** Staging feed schema (FIXTURES A1 / docx §8) — everything arrives as
    * strings; casts are explicit, never inferred.
    */
  val feedSchema: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("product_name", StringType),
    StructField("price", StringType),
    StructField("brand", StringType),
    StructField("material", StringType),
    StructField("shape", StringType),
    StructField("dimension", StringType),
    StructField("origin", StringType),
    StructField("quantity_available", StringType),
    StructField("product_url", StringType)))

  val stringCols: Seq[String] = Seq(
    "sku", "product_name", "brand", "material", "shape", "dimension",
    "origin", "product_url")

  /** The 10 change-tracked columns of the SCD2 merge
    * (`load_to_dw.py:270-281`).
    */
  val trackedCols: Seq[String] = Seq(
    "sku", "product_name", "price", "brand", "material", "shape",
    "dimension", "origin", "quantity_available", "product_url")

  /** P2: daily CSV → typed, keyed, null-filled, deduped staging frame.
    * Mirrors `load_to_staging.py` row loop + in-DB transform as one
    * declarative pipeline (S6 + D4 + F2 + F3 + A1).
    */
  def ingestDaily(spark: SparkSession, path: String, idConfig: Int,
                  dtExtract: Date, dtLoad: Date): DataFrame = {
    val raw = spark.read.schema(feedSchema)
      .option("header", "true")
      .option("encoding", "UTF-8")
      .csv(path)
      // arrival order stands in for the reference's physical ctid
      // tie-break (SURVEY A1 note: ctid order is arbitrary anyway)
      .withColumn("__arrival", monotonically_increasing_id())

    val typed = raw
      .withColumn("price", trim(col("price")).cast("int"))
      .withColumn("quantity_available",
        Clean.digitsOnly(col("quantity_available")).cast("int"))
      .withColumn("natural_key",
        Clean.naturalKey(col("product_name"), col("sku")))
      .withColumn("id_config", lit(idConfig))
      .withColumn("dt_extract", lit(dtExtract))
      .withColumn("dt_load", lit(dtLoad))

    val filled = Clean.nullFill(typed, stringCols,
      Seq("price", "quantity_available"))

    Clean.dedupFirst(filled, Seq("natural_key"), Seq(col("__arrival").asc))
      .drop("__arrival")
  }

  /** P3 step 3.5: today's staging slice for one config — the temp_dw
    * projection + filters (P1/P2/D1, `load_to_dw.py:130-140`).
    */
  def snapshotOf(staging: DataFrame, idConfig: Int, dtLoad: Date): DataFrame =
    staging
      .filter(col("id_config") === idConfig && col("dt_load") === lit(dtLoad))
      .select((Seq("natural_key") ++ trackedCols ++
        Seq("id_config", "dt_extract", "dt_load")).map(col): _*)

  /** P3 steps 3.6-3.11: textbook SCD2 merge of the snapshot into `dw`,
    * then the date-dim FK backfill (J5) as a broadcast join (date_dim is
    * 7 671 rows at any scale).
    */
  def loadToDw(dw: DataFrame, snapshot: DataFrame, loadDate: Date): DataFrame = {
    val merged = Scd2.merge(dw.drop("dt_dim"), snapshot, "natural_key",
      trackedCols, loadDate)
    val dateDim = DateDim.generate(dw.sparkSession)
      .select(col("id").as("dt_dim"), col("full_date"))
    merged.join(broadcast(dateDim),
      merged("dt_extract") === dateDim("full_date"), "left")
      .drop("full_date")
  }

  /** Warehouse schema = snapshot columns + SCD2 columns (docx §9 `dw`,
    * minus the backfilled `dt_dim` which [[loadToDw]] re-derives).
    */
  val dwSchema: StructType = StructType(
    StructField("natural_key", StringType) +:
      feedSchema.fields.map(f =>
        if (f.name == "price" || f.name == "quantity_available")
          f.copy(dataType = IntegerType)
        else f).toSeq :+
      StructField("id_config", IntegerType) :+
      StructField("dt_extract", DateType) :+
      StructField("dt_load", DateType) :+
      StructField("dt_load_to_dw", DateType) :+
      StructField("dt_last_update", DateType))

  /** Empty dw frame, for first-day loads. */
  def emptyDw(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], dwSchema)
}
