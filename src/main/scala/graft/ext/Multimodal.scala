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

  /** "Resize": payload transform + metadata rewrite, batched per
    * partition. A real implementation swaps [[stubResize]] for an image
    * scaler (JNI/libvips); schema, row-count contract and batch shape
    * are the production plumbing.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        // scaler initialization would happen HERE, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          Row(r.getLong(0), r.getString(1), stubResize(payload, width, height),
            Row("application/octet-stream", width, height,
              r.getAs[Row](3).getAs[java.lang.Long]("duration_ms")))
        }
      }(enc)
  }

  /** STUB scaler: deterministic downsample — keeps every stride-th byte
    * so output size tracks the target area (a real codec decodes,
    * scales, re-encodes).
    */
  private def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty) payload
    else {
      val target = math.max(1, math.min(payload.length, w * h / 256))
      val stride = math.max(1, payload.length / target)
      payload.indices.collect { case i if i % stride == 0 => payload(i) }
        .toArray
    }
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = true)))

  /** "Frame sampling": one row per sampled frame (row-expanding, like a
    * video decoder emitting every Nth frame). The stub slices the payload
    * into `n` contiguous chunks; a real implementation seeks keyframes.
    */
  def frameSample(media: DataFrame, n: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null || payload.isEmpty) Iterator.empty
        else {
          val chunk = math.max(1, payload.length / n)
          (0 until math.min(n, payload.length)).iterator.map { i =>
            Row(id, i, payload.slice(i * chunk,
              math.min(payload.length, (i + 1) * chunk)))
          }
        }
      }
    }(enc)
  }
}
