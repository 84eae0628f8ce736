package graft.mart

import java.sql.Date

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dim.DateDim
import graft.etl.Scd2
import graft.ext.RangeJoin

/** P4' — the mart layer the reference ARCHITECTS but never shipped: its
  * diagram and doc name a `load_to_dm.py` stage ("(S6) load_to_dm.py",
  * architecture.drawio page 1; docx §1 P4 "load dữ liệu vào dm") feeding
  * dim/fact tables for PowerBI, but the script is absent from the repo —
  * SURVEY §0 and §7 (M5) call for its semantics to be DESIGNED from the
  * `dw` it would consume. This module is that design: a star schema over
  * the SCD2 warehouse.
  *
  *  - [[dimProduct]]   — SCD2-keyed product dimension (one row per
  *                       version, deterministic surrogate key);
  *  - `dim_date`       — [[graft.dim.DateDim.generate]] (§2.8), already a
  *                       conformed dimension; [[dimDate]] aliases its id
  *                       to the star's `date_sk`;
  *  - [[factInventorySnapshot]] — periodic-snapshot fact: the
  *                       price/quantity each product HAD on each calendar
  *                       date, derived by joining the calendar against
  *                       the versions' validity intervals.
  *
  * Scale shape: the dimension build is MAP-ONLY (the surrogate key is a
  * hash, not a sequence — a row_number over the full dimension would
  * funnel 100 TB of history through one sorted partition). The fact build
  * is the bucketized range join ([[graft.ext.RangeJoin]]): the calendar
  * side is tiny (thousands of days), versions replicate only across the
  * buckets their CAPPED validity overlaps, and the join is an equi-join
  * on the bucket key — never a nested loop against the warehouse.
  */
object Mart {

  /** Deterministic surrogate key for a dimension version: the first 60
    * bits of `md5(natural_key | version_start)` as a BIGINT.
    *
    * Hash, not sequence, for two scale reasons: (a) map-only — no global
    * row_number sort, no driver-side counter; (b) STABLE across full
    * rewrites and incremental merges (SURVEY §7 M3's "deterministic
    * surrogate keys across rewrites") — re-building the dimension never
    * re-keys facts already written. 60 bits keep the value positive in a
    * signed 64-bit column; collision odds across 10^9 versions are
    * ~2.5e-17 per pair (birthday bound ≈ 4e-4 for the full set), and any
    * external engine reproduces the key from the md5 hex prefix.
    */
  def surrogateKey(naturalKey: Column, versionStart: Column): Column =
    graft.functions.NativeExprs.md5Prefix(
      concat_ws("|", naturalKey.cast("string"),
        versionStart.cast("string")), 15)

  /** SCD2-keyed product dimension from the warehouse: one row per
    * version, surrogate-keyed, with the validity window renamed to the
    * mart convention (`valid_from`/`valid_to` half-open, `is_current`).
    * Map-only: project + hash.
    */
  def dimProduct(dw: DataFrame, attrCols: Seq[String]): DataFrame =
    dw.select(
      (surrogateKey(col("natural_key"), col("dt_load_to_dw"))
        .as("product_sk") +:
        col("natural_key") +:
        attrCols.map(col) :+
        col("dt_load_to_dw").as("valid_from") :+
        col("dt_last_update").as("valid_to") :+
        (col("dt_last_update") === lit(Scd2.Sentinel)).as("is_current")): _*)

  /** The conformed calendar dimension with the star's key name. */
  def dimDate(spark: SparkSession): DataFrame =
    DateDim.generate(spark).withColumnRenamed("id", "date_sk")

  /** Periodic-snapshot fact: for every date of `dates` (a calendar slice
    * carrying a DATE column `dateCol`), the measure values of the product
    * version valid on that date — i.e. what a nightly
    * "inventory-as-of-today" append would have produced, reconstructed
    * from SCD2 validity intervals.
    *
    * Join shape: [[graft.ext.RangeJoin.pointInInterval]] over epoch-day
    * ints. Open versions (sentinel `valid_to`) are CAPPED to the
    * calendar's max date + 1 before bucketization — an uncapped sentinel
    * interval would replicate each open version across ~8000 years of
    * buckets. The cap reads one scalar off the (tiny) calendar side;
    * match semantics are unchanged because no calendar point lies beyond
    * it. Bucket width defaults to the median capped validity length
    * ([[graft.ext.RangeJoin.autoBucketWidth]]).
    *
    * Output: `dates` columns + `product_sk`, `natural_key`, measures.
    */
  def factInventorySnapshot(dw: DataFrame, dates: DataFrame,
                            dateCol: String, measures: Seq[String],
                            bucketWidth: Option[Long] = None): DataFrame = {
    val maxDay = dates.agg(max(unix_date(col(dateCol)))).head() match {
      case r if r.isNullAt(0) => 0L // empty calendar: fact is empty anyway
      case r => r.getInt(0).toLong
    }
    val pts = dates.withColumn("__day", unix_date(col(dateCol)).cast("long"))
    val ivs = dw.select(
      (surrogateKey(col("natural_key"), col("dt_load_to_dw"))
        .as("product_sk") +:
        col("natural_key") +:
        measures.map(col) :+
        unix_date(col("dt_load_to_dw")).cast("long").as("__lo") :+
        least(unix_date(col("dt_last_update")).cast("long"),
          lit(maxDay + 1L)).as("__hi")): _*)
    val w = bucketWidth.getOrElse(
      RangeJoin.autoBucketWidth(ivs, "__lo", "__hi"))
    RangeJoin.pointInInterval(pts, ivs, "__day", "__lo", "__hi", w)
      .drop("__day", "__lo", "__hi")
  }

  // ── Report layer (the docx's P4 exists to feed PowerBI reports,
  //    docx §1) — report queries read ONLY the star: fact + conformed
  //    dimensions, no reach-back into the warehouse. ────────────────────

  /** Brand × month rollup of the periodic-snapshot fact: per (brand,
    * year-month) totals with rollup subtotal rows (per-brand and grand
    * total). Scale shape: ONE broadcastable dimension join (dims are
    * small by star-schema construction) + ONE aggregation shuffle; the
    * rollup's extra grouping sets ride the same shuffle via partial
    * aggregation.
    *
    * `year_month` is derived map-side from the fact's own `dateCol` — the
    * snapshot fact carries the calendar date it was built from
    * ([[factInventorySnapshot]] keeps the `dates` columns), so re-joining
    * `dim_date` for a month attribute would be both a wasted join and a
    * self-join of the calendar plan the fact already embeds (Spark's
    * ambiguous-self-join detection rejects it — the dataset-id metadata
    * collides even under instance-qualified refs).
    */
  def reportBrandMonth(star: Star, brandCol: String = "brand",
                       measures: Seq[String] =
                         Seq("price", "quantity_available"),
                       dateCol: String = "full_date"): DataFrame =
    star.fact
      .join(star.dimProduct.select(col("product_sk"), col(brandCol)),
        "product_sk")
      .withColumn("year_month", date_format(col(dateCol), "yyyy-MM"))
      .rollup(col(brandCol), col("year_month"))
      .agg(count(lit(1)).as("snapshot_rows"),
        measures.map(m => sum(col(m)).as(s"total_$m")): _*)

  /** Current-inventory cube: the star's LATEST snapshot date, cubed over
    * the given dimension attributes. The "latest date" scalar is a
    * 1-row aggregate joined back via broadcast — no driver-side action,
    * the whole report stays one lazy plan.
    */
  def reportCurrentInventory(star: Star, dims: Seq[String],
                             measures: Seq[String] =
                               Seq("quantity_available")): DataFrame = {
    val lastDay = star.fact.agg(max(col("date_sk")).as("date_sk"))
    star.fact
      .join(broadcast(lastDay), "date_sk")
      .join(star.dimProduct.select((col("product_sk") +:
        dims.map(col)): _*), "product_sk")
      .cube(dims.map(col): _*)
      .agg(count(lit(1)).as("n_products"),
        measures.map(m => sum(col(m)).as(s"total_$m")): _*)
  }

  /** The built star. `unpersist()` releases the warehouse snapshot
    * [[build]] pinned — call it once every star member has been consumed
    * (written out / benched); before that, unpersisting would re-derive
    * the SCD2 merge on the next member's action.
    */
  final case class Star(dimProduct: DataFrame, dimDate: DataFrame,
                        fact: DataFrame,
                        private val pinned: Option[DataFrame] = None) {
    def unpersist(): Unit = pinned.foreach(_.unpersist())
  }

  /** Materialize a built star as BUCKETED tables co-located on
    * `product_sk` — the physical P4' layout (the reference's dm would be
    * Postgres tables; ours are bucketed parquet). `dim_product` and the
    * fact are both written with `bucketBy(buckets, product_sk)` and
    * sorted within buckets, after a `repartition(buckets, product_sk)`
    * that lands exactly ONE file per bucket (repartition and bucketing
    * share the murmur3-mod hash), so every later fact⋈dim_product join —
    * the join EVERY report repeats — plans as a zero-exchange, zero-sort
    * sort-merge join. `dim_date` stays logical: it is broadcast-sized by
    * construction.
    *
    * At 100 TB this is the load-once/read-many trade: the two shuffles
    * move from every report to the nightly mart load, and report cost
    * stops scaling with the star's width. Returns a Star reading from
    * the materialized tables.
    */
  def materializeStar(spark: SparkSession, star: Star, prefix: String,
                      buckets: Int = 8): Star = {
    import graft.sources.Bucketing
    Bucketing.writeBucketed(
      star.dimProduct.repartition(buckets, col("product_sk")),
      s"${prefix}_dim_product", "product_sk", buckets, Seq("product_sk"))
    Bucketing.writeBucketed(
      star.fact.repartition(buckets, col("product_sk")),
      s"${prefix}_fact", "product_sk", buckets, Seq("product_sk"))
    Star(spark.table(s"${prefix}_dim_product"), star.dimDate,
      spark.table(s"${prefix}_fact"))
  }

  /** One-call P4' build, composed from `dw` the way
    * [[graft.runner.DailyJob]] composes E1'–E3': the product dimension,
    * the calendar dimension, and the snapshot fact for the calendar slice
    * `[from, until]`.
    *
    * The merged `dw` lineage is consumed by BOTH star members (dimension
    * project + fact range join) plus the fact's width aggregate, so
    * `build` pins it with `.persist(MEMORY_AND_DISK)` for the star's
    * lifetime — without the pin an in-one-job composition executes the
    * upstream SCD2 merge once per consumer (observed: 4 source scans in
    * the q65 plan). In production P4 the dw is a MATERIALIZED warehouse
    * table and the pin costs one cheap cache of an already-cheap scan.
    * Call [[Star.unpersist]] when done with the star.
    *
    * `pin = false` skips the persist (and leaves [[Star.unpersist]] a
    * no-op) for callers that pass an ALREADY-persisted shared dw — e.g. a
    * query surface building many stars over one warehouse snapshot, where
    * per-build re-pinning would only emit "already cached" warnings and
    * re-register the same cache entry.
    */
  def build(spark: SparkSession, dw: DataFrame, attrCols: Seq[String],
            measures: Seq[String], from: Date, until: Date,
            pin: Boolean = true): Star = {
    val dwP = if (pin)
      dw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else dw
    val dd = dimDate(spark)
    val slice = dd.filter(col("full_date") >= lit(from) &&
      col("full_date") <= lit(until))
      .select("date_sk", "full_date")
    Star(
      dimProduct(dwP, attrCols),
      dd,
      factInventorySnapshot(dwP, slice, "full_date", measures),
      pinned = if (pin) Some(dwP) else None)
  }
}
