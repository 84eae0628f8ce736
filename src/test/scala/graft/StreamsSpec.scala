package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** The streaming path must produce the same result as the batch path for
  * the same input files (identical logical plan, Structured Streaming
  * micro-batch execution).
  */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source stream of events equals the batch windowed aggregate") {
    val batchEvents = Tables.load(spark, TestSpark.sf0001, "events")
    val batch = Streams.windowedCounts(batchEvents)

    // stage the batch frame as parquet so the stream reads identical data
    // with a vanilla TIMESTAMP column (the raw file is TIMESTAMP(NANOS),
    // which the streaming parquet source rejects pre-conversion)
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
      .toString
    batchEvents.write.mode("overwrite").parquet(dir)

    val stream = Streams.eventStream(spark, dir,
      batchEvents.schema)
    val streamed = Streams.runToMemory(
      Streams.windowedCounts(stream, watermark = "100 hours"), "wc_test")

    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
    assert(batch.count() > 0)
  }
}
