package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, and a batched "decode/feature-extract" stage.
  *
  * The media codecs themselves are NOT in this container, so the decode
  * step is a clearly-marked deterministic stub (`stubDecode`) — but the
  * Spark-side plumbing is real: schema, encoder, partition-batched
  * `mapPartitions` (the Scala analogue of `mapInPandas` batching), and a
  * row-count-preserving contract. Swap `stubDecode` for a JNI/ffmpeg call
  * and nothing else changes.
  */
object Multimodal {

  /** Typed media metadata carried alongside the payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )), nullable = true)))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes.
    * Stands in for `spark.read.format("binaryFile")` over a media lake.
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      lit("image/stub").as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (length(col(textCol)) % 1920).cast("int").as("width"),
        (length(col(textCol)) % 1080).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** STUB decoder: a real implementation would decode the image/audio
    * payload (e.g. libjpeg/ffmpeg via JNI) and emit model features. The
    * stub derives a deterministic 4-dim feature from the payload bytes so
    * the pipeline is testable end-to-end. Batch shape: mapPartitions — one
    * decoder init per partition, streaming rows through it, exactly how a
    * heavyweight codec should be amortized on a cluster.
    */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      // decoder/codec initialization would happen HERE, once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length.toLong, stubDecode(payload))
      }
    }(enc)
  }

  /** Deterministic fake of the codec: 4 byte-statistics as "features". */
  private def stubDecode(payload: Array[Byte]): Array[Double] = {
    if (payload.isEmpty) Array(0.0, 0.0, 0.0, 0.0)
    else {
      var sum = 0L; var mn = 255L; var mx = 0L
      payload.foreach { b =>
        val v = (b & 0xff).toLong
        sum += v; if (v < mn) mn = v; if (v > mx) mx = v
      }
      Array(payload.length.toDouble, sum.toDouble / payload.length,
        mn.toDouble, mx.toDouble)
    }
  }
}
