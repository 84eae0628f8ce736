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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as nanos-since-epoch longs and convert to a
    * microsecond TimestampType column (the testdata has no sub-µs
    * components, verified against the generator output — so this is
    * lossless and matches how DuckDB reads the same file).
    */
  private def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Integral `div`, not `/`: nanos-since-epoch (~1.7e18) exceeds a
    // double's 53-bit mantissa, so float division drifts the low µs.
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
}
