package graft.etl

import java.sql.Date
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Textbook SCD2 merge (SURVEY §2.7). The reference composes this from
  * four sequential Postgres statements (`load_to_dw.py:543-556`: anti-join
  * insert, update-join close, changed re-insert, dim backfill) and carries
  * a duplicate-inflation bug (no open-version guard on the change join,
  * `load_to_dw.py:270-281` — SURVEY B3). We implement the textbook intent:
  * the snapshot is compared against CURRENT versions only.
  *
  * Spark has no in-place UPDATE, so the merge is a full rewrite of the
  * dimension: one left join snapshot↔current + three cheap unions. At
  * 100 TB the dimension should be partitioned by a stable bucket of the
  * natural key so the single shuffle co-locates both sides; history
  * (closed) versions are untouched rows that flow through unchanged —
  * with a date-partitioned dimension only current partitions rewrite.
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

    // Change detection via a single order-independent hash of the tracked
    // columns (null-safe: hash() folds nulls deterministically). Cheaper
    // than a 10-column OR and one expression regardless of column count.
    def withSig(df: DataFrame) =
      df.withColumn("__sig", xxhash64(tracked.map(col): _*))

    val snap = withSig(snapshot)
    val cur  = withSig(current)

    val joined = snap.alias("s").join(cur.alias("c"), Seq(key), "full_outer")

    val isNew       = col(s"c.__sig").isNull && col(s"s.__sig").isNotNull
    val isGone      = col(s"s.__sig").isNull && col(s"c.__sig").isNotNull
    val isChanged   = col(s"s.__sig").isNotNull && col(s"c.__sig").isNotNull &&
      col(s"s.__sig") =!= col(s"c.__sig")
    val isUnchanged = col(s"s.__sig").isNotNull && col(s"c.__sig").isNotNull &&
      col(s"s.__sig") === col(s"c.__sig")

    val snapCols = snapshot.columns
    def fromSnap(df: DataFrame) = df.select(col(key) +:
      snapCols.filterNot(_ == key).map(c => col(s"s.$c").as(c)): _*)
    def fromCur(df: DataFrame) = df.select(col(key) +:
      current.columns.filterNot(c => c == key || c == "__sig")
        .map(c => col(s"c.$c").as(c)): _*)

    // 1) brand-new keys → open version
    val news = fromSnap(joined.filter(isNew))
      .withColumn("dt_load_to_dw", lit(loadDate))
      .withColumn("dt_last_update", lit(Sentinel))
    // 2) changed keys → close old version, append new open version
    val closedOut = fromCur(joined.filter(isChanged))
      .withColumn("dt_last_update", lit(loadDate))
    val newVersions = fromSnap(joined.filter(isChanged))
      .withColumn("dt_load_to_dw", lit(loadDate))
      .withColumn("dt_last_update", lit(Sentinel))
    // 3) unchanged + keys absent from today's snapshot stay as-is
    val untouched = fromCur(joined.filter(isUnchanged || isGone))

    val cols = news.columns.map(col)
    closed.select(cols: _*)
      .unionByName(untouched.select(cols: _*))
      .unionByName(closedOut.select(cols: _*))
      .unionByName(news)
      .unionByName(newVersions)
  }
}
