package graft.etl

import java.sql.Date
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Textbook SCD2 merge (SURVEY §2.7). The reference composes this from
  * four sequential Postgres statements (`load_to_dw.py:543-556`: anti-join
  * insert, update-join close, changed re-insert, dim backfill) and carries
  * a duplicate-inflation bug (no open-version guard on the change join,
  * `load_to_dw.py:270-281` — SURVEY B3). We implement the textbook intent:
  * the snapshot is compared against CURRENT versions only.
  *
  * Spark has no in-place UPDATE: [[merge]] rewrites the dimension as ONE
  * full-outer join snapshot↔current with per-key case expansion (1-2
  * output rows per key), history flowing through untouched;
  * [[mergeInPlace]] is the incremental variant over an
  * `is_current`-partitioned warehouse where closed history is
  * append-only and never rescanned. At 100 TB, bucket both sides by the
  * natural key so the single join co-locates.
  */
object Scd2 {

  val Sentinel: Date = Date.valueOf("9999-12-31")

  /** Merge `snapshot` (one row per `key`, no SCD columns) into `dim`
    * (rows carry `dt_load_to_dw`, `dt_last_update`; open versions have
    * `dt_last_update = 9999-12-31`).
    *
    * @param tracked columns whose change forces a new version (the
    *                reference's 10-column OR, `load_to_dw.py:270-281`)
    */
  def merge(dim: DataFrame, snapshot: DataFrame, key: String,
            tracked: Seq[String], loadDate: Date): DataFrame = {
    val closed  = dim.filter(col("dt_last_update") =!= lit(Sentinel))
    val current = dim.filter(col("dt_last_update") === lit(Sentinel))

    // Change detection via a single hash of the tracked columns. Spark's
    // hash expressions SKIP null children (the seed passes through
    // unchanged), so xxhash64(null, "x") == xxhash64("x", null): a value
    // shifting between adjacent tracked columns across a null swap would
    // be missed. Interleaving a per-column isNull flag disambiguates —
    // with equal flag vectors, the sequence of hashed non-null values maps
    // positionally onto columns, so signature equality implies per-column
    // null-safe equality. Still one expression regardless of column count,
    // and cheaper than a 10-column OR.
    def withSig(df: DataFrame) =
      df.withColumn("__sig",
        xxhash64((tracked.map(col) ++ tracked.map(c => col(c).isNull)): _*))

    val snap = withSig(snapshot)
    val cur  = withSig(current)

    val joined = snap.alias("s").join(cur.alias("c"), Seq(key), "full_outer")

    val isNew     = col("c.__sig").isNull && col("s.__sig").isNotNull
    val isChanged = col("s.__sig").isNotNull && col("c.__sig").isNotNull &&
      col("s.__sig") =!= col("c.__sig")

    // ONE pass over the joined rows: each key emits 1 or 2 output rows
    // (case-built array + explode). Filtering four separate branches out
    // of `joined` would re-execute the join and re-scan both inputs per
    // branch — 8 scans instead of 2 in the physical plan.
    val snapCols = snapshot.columns.toSeq
    val outCols = snapCols ++ Seq("dt_load_to_dw", "dt_last_update")

    val openFromSnap = struct(
      (snapCols.map(c =>
        (if (c == key) col(key) else col(s"s.$c")).as(c)) ++ Seq(
        lit(loadDate).as("dt_load_to_dw"),
        lit(Sentinel).as("dt_last_update"))): _*)
    def fromCur(lastUpdate: Column) = struct(
      (snapCols.map(c =>
        (if (c == key) col(key) else col(s"c.$c")).as(c)) ++ Seq(
        col("c.dt_load_to_dw").as("dt_load_to_dw"),
        lastUpdate.as("dt_last_update"))): _*)

    val emitted = joined.select(explode(
      when(isNew, array(openFromSnap))
        .when(isChanged, array(fromCur(lit(loadDate)), openFromSnap))
        .otherwise(array(fromCur(col("c.dt_last_update"))))) // unchanged/gone
      .as("r"))
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)

    closed.select(outCols.map(col): _*).unionByName(emitted)
  }

  /** Incremental SCD2 against a parquet warehouse partitioned by
    * `is_current` (the 100 TB layout): closed history is APPEND-ONLY and
    * is never read nor rewritten by a merge — only the (much smaller)
    * current partition is joined against the snapshot and dynamically
    * overwritten.
    *
    * Layout: `path/is_current=true/` (one open version per key) and
    * `path/is_current=false/` (closed history). Requires
    * `spark.sql.sources.partitionOverwriteMode=dynamic` so the overwrite
    * touches only `is_current=true`.
    */
  def mergeInPlace(spark: org.apache.spark.sql.SparkSession, path: String,
                   snapshot: DataFrame, key: String, tracked: Seq[String],
                   loadDate: Date): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // partition pruning: only is_current=true files are scanned
      val current = spark.read.parquet(path)
        .filter(col("is_current") === true).drop("is_current")
      val merged = merge(current, snapshot, key, tracked, loadDate)
        // materialize before writing into the path we just read
        .localCheckpoint(true)
      // 1) history is append-only: add ONLY the rows closed by this merge
      //    (an overwrite containing them would drop prior history)
      merged.filter(col("dt_last_update") =!= lit(Sentinel))
        .withColumn("is_current", lit(false))
        .write.mode("append").partitionBy("is_current").parquet(path)
      // 2) open rows dynamically overwrite just the is_current=true
      //    partition. Crash between the writes re-appends on retry —
      //    exactly-once needs a transactional table format (Delta MERGE);
      //    the partition layout and pruning behavior are identical there.
      merged.filter(col("dt_last_update") === lit(Sentinel))
        .withColumn("is_current", lit(true))
        .write.mode("overwrite").partitionBy("is_current").parquet(path)
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  /** Bootstrap the partitioned layout from a first-day snapshot. */
  def initPartitioned(snapshot: DataFrame, path: String,
                      loadDate: Date): Unit =
    snapshot
      .withColumn("dt_load_to_dw", lit(loadDate))
      .withColumn("dt_last_update", lit(Sentinel))
      .withColumn("is_current", lit(true))
      .write.mode("overwrite").partitionBy("is_current").parquet(path)
}
