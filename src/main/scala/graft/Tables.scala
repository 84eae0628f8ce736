package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry for the driver-generated TPC-H-ish testdata
  * (see TESTDATA.md): one parquet file per table under an sf dir.
  *
  * Scale notes (100 TB design): parquet scans go through the vectorized
  * reader with predicate pushdown + column pruning for free; at cluster
  * scale the same `spark.read.parquet(dir)` call fans out one task per
  * row-group split, so nothing here is local-mode-specific.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor the
    * reference operates at (region=5, nation=25 rows; supplier/customer
    * grow with sf but stay orders of magnitude below the fact tables).
    */
  val broadcastDims: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, sfDir) else
      spark.read.parquet(s"$sfDir/$name.parquet")

  /** The generator has shipped `events.ts` under several parquet
    * encodings over time — TIMESTAMP(NANOS) (readable only as
    * nanos-since-epoch longs under `nanosAsLong`), TIMESTAMP(MICROS)
    * with isAdjustedToUTC=false (arrives as TIMESTAMP_NTZ), and plain
    * UTC TIMESTAMP. Dispatch on the schema actually read rather than
    * hard-coding one encoding, and normalize to a session-tz
    * TimestampType column in every case — downstream `unix_micros(ts)`
    * callers reject NTZ, and the oracle (DuckDB) sees identical instants
    * because the session timezone is pinned to UTC.
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Harmless for micros/UTC files; required to read legacy NANOS files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // Legacy nanos-as-long. Integral `div`, not `/`: nanos-since-epoch
        // (~1.7e18) exceeds a double's 53-bit mantissa, so float division
        // would drift the low µs.
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // Value-preserving under the UTC session timezone.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported parquet type $other — expected " +
            "LONG (legacy nanos), TIMESTAMP_NTZ (micros), or TIMESTAMP")
    }
  }
}
