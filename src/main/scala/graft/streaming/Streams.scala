package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured-Streaming re-expression of the reference's daily batch
  * ingest (SURVEY §2.10): the Task-Scheduler-driven "new file per day"
  * loop becomes a file-source stream with watermarked tumbling windows.
  * The same transform builds both the batch and streaming plans —
  * write-once query logic, Catalyst plans both.
  */
object Streams {

  /** Watermarked tumbling-window aggregation over an event stream.
    * Works on a batch OR streaming DataFrame (identical logical plan).
    */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark)
              else events
    src.groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.functions.Parity.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))
  }

  /** File-source stream over a directory of event parquet (the streaming
    * analogue of the reference's daily CSV drop folder).
    */
  def eventStream(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Run a streaming query over existing files to completion via the
    * memory sink (local smoke path; on a cluster this would be a
    * `writeStream.format("delta"/"parquet")` with a real trigger).
    */
  def runToMemory(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }
}
