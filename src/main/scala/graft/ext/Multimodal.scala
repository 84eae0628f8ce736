package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, and a batched "decode/feature-extract" stage.
  *
  * SIX formats have fully REAL codec paths — parse, per-channel
  * statistics, nearest-neighbor resample, re-encode, all JVM-only:
  * binary PPM (P6, [[ppmDecode]]/[[ppmEncode]], exercised end-to-end by
  * q61), PNG (8-bit grey/RGB/RGBA via `java.util.zip`,
  * [[graft.ext.Png]], exercised by q68), JPEG (the JDK's bundled
  * `javax.imageio` baseline codec, exercised by q69 — lossy, so its
  * oracle checks a tolerance bound rather than exact means), GIF
  * (lossless under an explicit gray palette, q87), BMP (uncompressed
  * 24-bit, q88), and WAV
  * audio (RIFF/PCM16, [[graft.ext.Wav]], exercised by q75). Formats
  * that need codecs outside the JDK (compressed audio/video via ffmpeg)
  * remain a clearly-marked deterministic stub (`stubDecode`) behind the
  * same plumbing: schema, encoder, partition-batched `mapPartitions`
  * (the Scala analogue of `mapInPandas` batching), and a
  * row-count-preserving contract. Swap `stubDecode` for a JNI/ffmpeg
  * call and nothing else changes.
  */
object Multimodal {

  // ── Real codec: binary PPM (P6, maxval 255) ─────────────────────────

  /** `P6` magic probe. */
  def isPpm(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 2 &&
      payload(0) == 'P' && payload(1) == '6'

  /** Encode an RGB byte buffer (row-major, 3 bytes/pixel) as binary PPM. */
  def ppmEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"rgb buffer ${rgb.length} != 3*$width*$height")
    val header = s"P6\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse binary PPM: full header grammar (whitespace runs and `#`
    * comments between tokens, single whitespace after maxval, maxval ≤
    * 255). Returns (width, height, rgb) or None for malformed payloads —
    * a corrupt image must yield a null feature row, never a task crash.
    */
  def ppmDecode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isPpm(payload)) return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < payload.length) {
        val c = payload(i)
        if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        v = v * 10 + (payload(i) - '0'); i += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxv = readInt()
    i += 1 // the single whitespace byte after maxval
    if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
    // Long arithmetic: 3*w*h overflows Int for adversarial headers
    // (w=h=10^9), and a negative n would slip past the bounds check into
    // copyOfRange — a task crash, not the contracted None
    val n = 3L * w * h
    if (n > Int.MaxValue || i + n > payload.length) return None
    Some((w, h, java.util.Arrays.copyOfRange(payload, i, i + n.toInt)))
  }

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

  /** Build a REAL image table: each document's utf-8 bytes cycled into
    * the RGB plane of a `width`×`height` binary PPM. Deterministic (a
    * pure function of the text), so the q61 oracle reproduces the decoded
    * channel statistics exactly from the text column.
    */
  def asPpmMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, height: Int): DataFrame =
    cycledMediaTable(docs, idCol, textCol, width, height,
      "image/ppm", "image/x-portable-pixmap",
      (w, h, rgb, _) => ppmEncode(w, h, rgb))

  /** Shared builder for the deterministic image tables: each document's
    * utf-8 bytes cycled into the RGB plane, then encoded by `encode`
    * (which also receives the row id, letting a format vary per-row
    * parameters like the PNG scanline filter).
    */
  private def cycledMediaTable(docs: DataFrame, idCol: String,
                               textCol: String, width: Int, height: Int,
                               mediaType: String, mime: String,
                               encode: (Int, Int, Array[Byte], Long) => Array[Byte])
  : DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val src = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val rgb = new Array[Byte](3 * width * height)
          if (src.nonEmpty) {
            var i = 0
            while (i < rgb.length) { rgb(i) = src(i % src.length); i += 1 }
          }
          Row(id, mediaType, encode(width, height, rgb, id),
            Row(mime, width, height, null.asInstanceOf[java.lang.Long]))
        }
      }(enc)
  }

  /** Build a REAL PNG image table: each document's utf-8 bytes cycled
    * into the RGB plane of a `width`×`height` 8-bit truecolor PNG.
    * Pixels are the same deterministic function of the text as
    * [[asPpmMediaTable]]'s, so the q68 oracle reuses q61's channel-mean
    * arithmetic; the scanline filter varies per row (`media_id mod 5`),
    * so one oracle-gated query exercises ALL five unfilter paths of
    * [[Png.decode]].
    */
  def asPngMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, height: Int): DataFrame =
    cycledMediaTable(docs, idCol, textCol, width, height,
      "image/png", "image/png",
      (w, h, rgb, id) => Png.encode(w, h, rgb, colorType = 2,
        filter = math.floorMod(id, 5L).toInt))

  /** Build a REAL JPEG image table: same deterministic pixel plane as
    * [[asPpmMediaTable]], encoded by the JDK's baseline JPEG writer.
    * Decoded pixels are NOT bit-equal to the source (lossy), but channel
    * means survive within a small tolerance — q69's contract.
    */
  def asJpegMediaTable(docs: DataFrame, idCol: String, textCol: String,
                       width: Int, height: Int): DataFrame =
    cycledMediaTable(docs, idCol, textCol, width, height,
      "image/jpeg", "image/jpeg", (w, h, rgb, _) => jpegEncode(w, h, rgb))

  /** Build a REAL GIF image table. GIF is palette-indexed, so arbitrary
    * truecolor data would force a lossy quantization; instead the pixel
    * plane is GRAYSCALE (level = the R channel of the shared cycled
    * plane, i.e. `src[(3·p) mod len]`) under an explicit 256-entry
    * (i,i,i) palette — the encode is then LOSSLESS (palette + indices
    * verbatim) and the decoded channel means are SQL-exact, q87's
    * contract.
    */
  def asGifMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, height: Int): DataFrame =
    cycledMediaTable(docs, idCol, textCol, width, height,
      "image/gif", "image/gif", (w, h, rgb, _) => {
        val gray = new Array[Byte](w * h)
        var p = 0
        while (p < gray.length) { gray(p) = rgb(3 * p); p += 1 }
        gifEncode(w, h, gray)
      })

  /** Build a REAL BMP image table: the q61/q68 cycled RGB plane encoded
    * as uncompressed 24-bit BMP (the JDK writer's BI_RGB default) —
    * lossless, so the q68 exact-channel-mean oracle carries over
    * unchanged (q88).
    */
  def asBmpMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, height: Int): DataFrame =
    cycledMediaTable(docs, idCol, textCol, width, height,
      "image/bmp", "image/bmp", (w, h, rgb, _) => bmpEncode(w, h, rgb))

  /** Build a REAL audio table: each document's utf-8 bytes cycled into
    * `frames` mono PCM16 samples (`(byte − 128) · 256`, spanning the
    * int16 range) and encoded as canonical WAV. Deterministic, so the
    * q75 oracle reproduces the decoded per-channel means exactly from
    * the text column.
    */
  def asWavMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      frames: Int, sampleRate: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val src = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val samples = new Array[Short](frames)
          if (src.nonEmpty) {
            var i = 0
            while (i < frames) {
              samples(i) = (((src(i % src.length) & 0xff) - 128) * 256).toShort
              i += 1
            }
          }
          Row(id, "audio/wav",
            Wav.encode(Wav.Clip(1, sampleRate, samples)),
            Row("audio/x-wav", null.asInstanceOf[java.lang.Integer],
              null.asInstanceOf[java.lang.Integer],
              java.lang.Long.valueOf(frames.toLong * 1000L / sampleRate)))
        }
      }(enc)
  }

  /** Audio resample stage (the audio twin of [[resize]]): WAV payloads
    * are REALLY resampled ([[Wav.resample]], zero-order hold) and
    * re-encoded; non-audio payloads pass through untouched. Row-count
    * preserving, batched per partition.
    */
  def resampleAudio(media: DataFrame, outRate: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          Wav.decode(payload) match {
            case Some(clip) =>
              val out = Wav.resample(clip, outRate)
              Row(r.getLong(0), r.getString(1), Wav.encode(out),
                Row("audio/x-wav", null, null,
                  java.lang.Long.valueOf(
                    out.frames.toLong * 1000L / outRate)))
            case None =>
              Row(r.getLong(0), r.getString(1), payload, r.get(3))
          }
        }
      }(enc)
  }

  /** Build a REAL video table: each document's utf-8 bytes cycled into
    * `nFrames` mono `width`×`height` luma planes — frame f's pixel i is
    * byte `(f·w·h + i) mod len`, i.e. the SAME cycling as the image
    * tables but with a per-frame offset — encoded as a YUV4MPEG2 (Y4M)
    * stream ([[graft.ext.Y4m]], Cmono, 25 fps). Deterministic, so the
    * q109 oracle reproduces each sampled frame's mean luma exactly from
    * the text column.
    */
  def asY4mMediaTable(docs: DataFrame, idCol: String, textCol: String,
                      width: Int, height: Int, nFrames: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val src = r.getString(1)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val plane = width * height
          val frames = Vector.tabulate(nFrames) { f =>
            val y = new Array[Byte](plane)
            if (src.nonEmpty) {
              var i = 0
              while (i < plane) {
                y(i) = src((f * plane + i) % src.length); i += 1
              }
            }
            y
          }
          val v = Y4m.Video(width, height, 25, 1, frames)
          Row(id, "video/y4m", Y4m.encode(v),
            Row("video/x-yuv4mpeg", width, height,
              java.lang.Long.valueOf(v.durationMs)))
        }
      }(enc)
  }

  private val frameSampleSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_y", DoubleType, nullable = false)))

  /** Frame-sampling + per-frame featurization stage (the video leg of
    * the decode/resize/frame-sample brief): decode each Y4M payload,
    * keep frames 0, n, 2n, … ([[Y4m.sampleEveryN]]), and emit one row
    * per KEPT frame with its mean luma (integer sum, one exact
    * division). Malformed/non-video payloads contribute zero rows —
    * auditable via an anti-join against the input, never a crash.
    * Partition-batched like every codec stage here; at scale the
    * decoder amortizes per partition and rows fan out ≤ nFrames/n per
    * video.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1, s"sample stride $everyN")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(frameSampleSchema))
    media.select("media_id", "payload")
      .flatMap { r =>
        val id = r.getLong(0)
        Y4m.decode(r.getAs[Array[Byte]](1)).toSeq.flatMap { v =>
          v.frames.zipWithIndex.collect {
            case (f, i) if i % everyN == 0 =>
              Row(id, i, v.width, v.height, Y4m.meanLuma(f))
          }
        }
      }(enc)
  }

  val sceneCutSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("diff_sum", LongType, nullable = false),
    StructField("is_cut", BooleanType, nullable = false)))

  /** Scene-change detection over decoded Y4M video: per adjacent frame
    * pair, the exact sum of absolute luma differences over the plane;
    * frame f is a cut when the MEAN difference exceeds cutNum/cutDen,
    * tested as the integer cross-multiplication
    * diff_sum·cutDen > cutNum·plane — no float thresholding, so the
    * oracle replays every verdict exactly.
    *
    * Same scale shape as [[sampleFrames]]: one map stage over payloads,
    * row-expanding to frames−1 rows per clip, work proportional to
    * decoded bytes, no shuffle. Malformed/non-Y4M payloads emit no
    * rows (auditable-skip contract).
    */
  def sceneCuts(media: DataFrame, cutNum: Long, cutDen: Long): DataFrame = {
    require(cutNum >= 0 && cutDen >= 1, s"threshold $cutNum/$cutDen")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(sceneCutSchema))
    media.select("media_id", "payload")
      .flatMap { r =>
        val id = r.getLong(0)
        Y4m.decode(r.getAs[Array[Byte]](1)).toSeq.flatMap { v =>
          val plane = v.width * v.height
          (1 until v.frames.length).map { f =>
            val a = v.frames(f - 1)
            val b = v.frames(f)
            var d = 0L
            var i = 0
            while (i < plane) {
              d += math.abs((a(i) & 0xff) - (b(i) & 0xff))
              i += 1
            }
            Row(id, f, d, d * cutDen > cutNum * plane)
          }
        }
      }(enc)
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** Decode + feature-extract, batched per partition (one decoder init
    * per partition, streaming rows through it — how a heavyweight codec
    * is amortized on a cluster).
    *
    * PPM payloads take the REAL path: parse, then feature =
    * [width, height, meanR, meanG, meanB]. A malformed PPM yields a null
    * feature (auditable, never a crash). Other payloads fall to the
    * loudly-stubbed byte-statistics decoder ([[stubDecode]]) — the
    * codecs for JPEG/audio/video are not in this container.
    */
  /** Channel-stats feature of decoded RGB pixels:
    * [width, height, meanR, meanG, meanB].
    */
  private def ppmStats(w: Int, h: Int, px: Array[Byte]): Array[Double] = {
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < n) {
      sr += px(3 * p) & 0xff
      sg += px(3 * p + 1) & 0xff
      sb += px(3 * p + 2) & 0xff
      p += 1
    }
    Array(w.toDouble, h.toDouble, sr.toDouble / n,
      sg.toDouble / n, sb.toDouble / n)
  }

  // ── Real codec: JPEG via the JDK's bundled ImageIO plugin ───────────
  // javax.imageio ships a pure-Java baseline JPEG reader/writer in every
  // standard JDK — no native library needed — so JPEG gets a REAL decode
  // path after all. Lossy: roundtrips are near-exact in channel means
  // (quantization error averages out) but not bit-exact, so the
  // oracle-gated query (q69) checks a tolerance bound computed against
  // the exact source statistics rather than raw means.

  /** SOI marker probe (`FF D8 FF`). */
  def isJpeg(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 3 &&
      (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8 &&
      (payload(2) & 0xff) == 0xff

  // ImageIO defaults every read/write through a DISK-backed stream cache
  // (a temp file per call) — pure overhead for in-memory byte payloads
  // and a seek/IO hazard in executor tasks. Flip once per JVM.
  private lazy val imageIoNoDiskCache: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Encode an RGB buffer as baseline JPEG (ImageIO defaults). */
  def jpegEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"rgb buffer ${rgb.length} != 3*$width*$height")
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    // one bulk setRGB: per-pixel setRGB pays a colorspace-dispatch call
    // per pixel — a real cost at corpus row counts
    val packed = new Array[Int](width * height)
    var p = 0
    while (p < packed.length) {
      packed(p) = ((rgb(3 * p) & 0xff) << 16) |
        ((rgb(3 * p + 1) & 0xff) << 8) | (rgb(3 * p + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, width, height, packed, 0, width)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** GIF87a/GIF89a magic probe. */
  def isGif(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 6 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8' &&
      (payload(4) == '7' || payload(4) == '9') && payload(5) == 'a'

  /** BM magic probe (Windows bitmap). */
  def isBmp(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 2 &&
      payload(0) == 'B' && payload(1) == 'M'

  /** Encode an 8-bit grayscale buffer as GIF under an explicit (i,i,i)
    * palette — lossless by construction (256 palette entries cover every
    * level; the writer stores palette + indices verbatim). A truecolor
    * source would instead be quantized by the JDK writer — callers with
    * RGB data should use PNG/BMP.
    */
  def gifEncode(width: Int, height: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == width * height,
      s"gray buffer ${gray.length} != $width*$height")
    imageIoNoDiskCache
    val ramp = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, width, height, gray)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** Encode an RGB buffer as uncompressed 24-bit BMP (lossless). */
  def bmpEncode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"rgb buffer ${rgb.length} != 3*$width*$height")
    imageIoNoDiskCache
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val packed = new Array[Int](width * height)
    var p = 0
    while (p < packed.length) {
      packed(p) = ((rgb(3 * p) & 0xff) << 16) |
        ((rgb(3 * p + 1) & 0xff) << 8) | (rgb(3 * p + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, width, height, packed, 0, width)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** Decode any ImageIO-sniffable payload (JPEG/GIF/BMP here) to
    * (width, height, RGB bytes); None for malformed payloads (ImageIO
    * returns null or throws on corrupt streams).
    */
  def jpegDecode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      imageIoNoDiskCache
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0 || 3L * w * h > Int.MaxValue) None
        else {
          // one bulk getRGB (single colorspace pass), then unpack
          val packed = img.getRGB(0, 0, w, h, null, 0, w)
          val rgb = new Array[Byte](3 * w * h)
          var p = 0
          while (p < packed.length) {
            val v = packed(p)
            rgb(3 * p) = ((v >> 16) & 0xff).toByte
            rgb(3 * p + 1) = ((v >> 8) & 0xff).toByte
            rgb(3 * p + 2) = (v & 0xff).toByte
            p += 1
          }
          Some((w, h, rgb))
        }
      }
    } catch { case _: Throwable => None }

  /** Real-codec dispatch: PPM, PNG and JPEG payloads decode to
    * (w, h, rgb); anything else (including a malformed member of these
    * formats, which the codecs signal as None) has no real decode here.
    */
  private def realDecode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    if (isPpm(payload)) ppmDecode(payload)
    else if (Png.isPng(payload)) Png.decode(payload)
    else if (isJpeg(payload) || isGif(payload) || isBmp(payload))
      jpegDecode(payload) // ImageIO sniffs the actual format
    else None

  private def hasRealCodec(payload: Array[Byte]): Boolean =
    isPpm(payload) || Png.isPng(payload) || isJpeg(payload) ||
      isGif(payload) || isBmp(payload)

  /** The per-payload feature contract shared by [[decodeFeatures]] and
    * [[resizeWithFeatures]]: real stats for a decodable PPM/PNG/JPEG
    * (channel means) or WAV (per-channel sample means via [[Wav.stats]]),
    * null for a malformed member of a real-codec format (auditable,
    * never a crash), byte-statistics stub otherwise.
    */
  private def featureOf(payload: Array[Byte]): Array[Double] =
    if (Wav.isWav(payload)) Wav.decode(payload).map(Wav.stats).orNull
    else if (hasRealCodec(payload))
      realDecode(payload).map { case (w, h, px) => ppmStats(w, h, px) }.orNull
    else stubDecode(payload)

  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(featureSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      // decoder/codec initialization would happen HERE, once per partition
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, payload.length.toLong, featureOf(payload))
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

  /** Nearest-neighbor RGB resample — the real scaler behind [[resize]]
    * for decoded PPM pixels.
    */
  def resampleRgb(src: Array[Byte], sw: Int, sh: Int,
                  dw: Int, dh: Int): Array[Byte] = {
    val out = new Array[Byte](3 * dw * dh)
    var y = 0
    while (y < dh) {
      val sy = y * sh / dh
      var x = 0
      while (x < dw) {
        val sx = x * sw / dw
        val s = 3 * (sy * sw + sx)
        val d = 3 * (y * dw + x)
        out(d) = src(s); out(d + 1) = src(s + 1); out(d + 2) = src(s + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Re-encode resampled pixels in the SAME format the payload arrived
    * in: a resize stage must not silently convert a media lake's PNGs to
    * PPM (downstream consumers dispatch on format).
    */
  private def reencode(payload: Array[Byte], w: Int, h: Int,
                       rgb: Array[Byte]): (Array[Byte], String) =
    if (Png.isPng(payload)) (Png.encode(w, h, rgb), "image/png")
    else if (isJpeg(payload)) (jpegEncode(w, h, rgb), "image/jpeg")
    else (ppmEncode(w, h, rgb), "image/x-portable-pixmap")

  /** "Resize": payload transform + metadata rewrite, batched per
    * partition. PPM and PNG payloads are REALLY rescaled (decode →
    * nearest-neighbor [[resampleRgb]] → re-encode in the same format);
    * other formats use the loudly-stubbed byte downsample ([[stubResize]])
    * until a native scaler (JNI/libvips) is linked — schema, row-count
    * contract and batch shape are the production plumbing either way.
    */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val enc = ExpressionEncoder(RowEncoder.encoderFor(mediaSchema))
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        // scaler initialization would happen HERE, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val (outPayload, outMime) = realDecode(payload) match {
            case Some((sw, sh, px)) =>
              reencode(payload, width, height,
                resampleRgb(px, sw, sh, width, height))
            case None =>
              (stubResize(payload, width, height),
                "application/octet-stream")
          }
          // positional field access: rows deserialized from another
          // mapPartitions stage carry no schema for by-name lookup
          Row(r.getLong(0), r.getString(1), outPayload,
            Row(outMime, width, height,
              r.getAs[Row](3).getAs[java.lang.Long](3)))
        }
      }(enc)
  }

  /** Fused resize + feature-extract: ONE decode per row serves both the
    * rescaled payload and its channel statistics. Composing
    * [[resize]] → [[decodeFeatures]] as separate stages costs two full
    * codec passes per row (resize re-encodes, decodeFeatures re-parses
    * the new payload) — for a heavyweight codec the decode IS the cost,
    * so the fused form halves it. For the lossless formats (PPM, PNG)
    * this is bit-identical to the composition: the feature is computed
    * from the resampled pixels exactly as [[decodeFeatures]] computes it
    * from the re-encoded payload (same bytes either way). For JPEG the
    * fused feature reflects the PRE-encode pixels — free of the second
    * lossy generation the composition would measure — which is the more
    * faithful statistic. Stub-format payloads take the same stub pair.
    * Output = [[mediaSchema]] fields of the resized media plus
    * `byte_len`/`feature` of the result.
    */
  def resizeWithFeatures(media: DataFrame, width: Int, height: Int): DataFrame = {
    val schema = StructType(mediaSchema.fields ++ Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("feature", ArrayType(DoubleType), nullable = true)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
    media.select("media_id", "media_type", "payload", "meta")
      .mapPartitions { rows =>
        // codec/scaler initialization would happen HERE, once per partition
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val (outPayload, outMime, feature) = realDecode(payload) match {
            case Some((sw, sh, px)) =>
              val rgb = resampleRgb(px, sw, sh, width, height)
              val (encoded, mime) = reencode(payload, width, height, rgb)
              (encoded, mime, ppmStats(width, height, rgb))
            case None =>
              val sp = stubResize(payload, width, height)
              (sp, "application/octet-stream", featureOf(sp))
          }
          Row(r.getLong(0), r.getString(1), outPayload,
            Row(outMime, width, height,
              r.getAs[Row](3).getAs[java.lang.Long](3)),
            outPayload.length.toLong, feature)
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

  val audioFrameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false)))

  /** REAL frame sampling for audio: windows of `frameLen` frames every
    * `hop` frames over decoded WAV payloads, one row per window with its
    * exact sum-of-squares energy (int64 — the spectrogram-precursor
    * statistic; 64 samples × 32768² fits comfortably). Multichannel
    * windows cover all interleaved samples of the frame span. Non-WAV
    * or malformed payloads emit no frames — same auditable-skip
    * contract as the decoders. Row-expanding like a video keyframe
    * sampler; work is one map stage over the payloads.
    */
  def audioFrames(media: DataFrame, frameLen: Int, hop: Int): DataFrame = {
    require(frameLen > 0 && hop > 0, s"frameLen $frameLen hop $hop")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(audioFrameSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Wav.decode(r.getAs[Array[Byte]](1)) match {
          case Some(clip) =>
            val ch = clip.channels
            Iterator.from(0)
              .takeWhile(f => f.toLong * hop + frameLen <= clip.frames)
              .map { f =>
                var e = 0L
                var i = f * hop * ch
                val end = (f * hop + frameLen) * ch
                while (i < end) {
                  val s = clip.samples(i).toLong
                  e += s * s
                  i += 1
                }
                Row(id, f, frameLen * ch, e)
              }
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  val walshSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("n_samples", IntegerType, nullable = false),
    StructField("num", LongType, nullable = false),
    StructField("den", LongType, nullable = false),
    StructField("centroid", DoubleType, nullable = true)))

  /** Sequency-domain spectral summary per audio frame: the naive
    * Walsh–Hadamard transform W_k = Σ_i (−1)^popcount(k∧i)·x_i over
    * each `frameLen`-sample window, reduced to the spectral centroid
    * Σ k·|W_k| / Σ|W_k| over the AC sequencies k ≥ 1.
    *
    * Walsh, not Fourier, deliberately: the WHT is ±1 integer
    * arithmetic end to end, so the statistic is EXACT and an external
    * SQL oracle replays it bit-for-bit — a DFT's cos/sin carry no
    * cross-engine correct-rounding guarantee, which would turn a
    * codec-pipeline test into a floating-point epsilon test. The
    * centroid division is the only non-integer step and is emitted as
    * a ⌊num·1e6/den⌋ quantization (NULL for silent frames, den = 0).
    *
    * O(n²) per frame (n = frameLen·channels ≤ 64 here) in one map
    * stage over the payloads — same scale shape as [[audioFrames]]:
    * row-expanding, no shuffle, work proportional to decoded bytes.
    */
  private val vadSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("media_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("n_frames",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_active",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_segments",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("longest_run",
      org.apache.spark.sql.types.IntegerType, nullable = false)))

  /** Energy-based voice-activity detection over PCM clips: frame the
    * samples (non-overlapping `frameLen`-sample windows), mark a frame
    * active when its EXACT integer energy Σ s² exceeds `threshold`,
    * and fold the run-length structure (active frames, segments =
    * maximal active runs, longest run) in the same pass. One
    * row-preserving map stage — decode, energies, and segmentation all
    * happen inside the task, no shuffle, work proportional to decoded
    * bytes; the per-clip output is 4 counters, which is what a 100 TB
    * speech-curation filter wants to aggregate next.
    */
  def audioVadSegments(media: DataFrame, frameLen: Int,
                       threshold: Long): DataFrame = {
    require(frameLen > 0, s"frameLen $frameLen")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(vadSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Wav.decode(r.getAs[Array[Byte]](1)) match {
          case Some(clip) =>
            val n = clip.samples.length / frameLen
            var f = 0
            var active = 0; var segs = 0; var run = 0; var longest = 0
            while (f < n) {
              var e = 0L
              var i = f * frameLen
              val end = i + frameLen
              while (i < end) {
                val s = clip.samples(i).toLong
                e += s * s
                i += 1
              }
              if (e > threshold) {
                active += 1; run += 1
                if (run == 1) segs += 1
                if (run > longest) longest = run
              } else run = 0
              f += 1
            }
            Iterator.single(Row(id, n, active, segs, longest))
          case None => Iterator.empty
        }
      }
    }(enc)
  }

  def audioWalshSpectrum(media: DataFrame, frameLen: Int,
                         hop: Int): DataFrame = {
    require(frameLen > 0 && hop > 0, s"frameLen $frameLen hop $hop")
    val enc = ExpressionEncoder(RowEncoder.encoderFor(walshSchema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        Wav.decode(r.getAs[Array[Byte]](1)) match {
          case Some(clip) =>
            val ch = clip.channels
            val n = frameLen * ch
            require((n & (n - 1)) == 0,
              s"WHT window must be a power of two, got $n")
            Iterator.from(0)
              .takeWhile(f => f.toLong * hop + frameLen <= clip.frames)
              .map { f =>
                val base = f * hop * ch
                var num = 0L
                var den = 0L
                var k = 1
                while (k < n) {
                  var wk = 0L
                  var i = 0
                  while (i < n) {
                    val x = clip.samples(base + i).toLong
                    if ((Integer.bitCount(k & i) & 1) == 0) wk += x
                    else wk -= x
                    i += 1
                  }
                  val a = math.abs(wk)
                  num += k.toLong * a
                  den += a
                  k += 1
                }
                val centroid: java.lang.Double =
                  if (den == 0L) null
                  else java.lang.Double.valueOf(
                    (num * 1000000L / den).toDouble / 1.0e6)
                Row(id, f, n, num, den, centroid)
              }
          case None => Iterator.empty
        }
      }
    }(enc)
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

  /** Perceptual average-hash (aHash) of each image: decode, nearest-
    * neighbor downsample to 8×8 with the codec's own resampler, then
    * per-cell integer luminance L = r+g+b (0..765) thresholded against
    * the image total — bit i is `L_i·64 > ΣL` (strict, integer-only:
    * no float mean for engines to disagree on). Emitted as a 64-char
    * '0'/'1' string, row-major. Undecodable payloads hash to null.
    */
  def aHash(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField,
      StructType}
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", StringType)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(schema))
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val h = ppmDecode(r.getAs[Array[Byte]](1)).map { case (w, hh, px) =>
          val small = resampleRgb(px, w, hh, 8, 8)
          val lum = Array.tabulate(64)(i => (small(3 * i) & 0xff) +
            (small(3 * i + 1) & 0xff) + (small(3 * i + 2) & 0xff))
          val total = lum.foldLeft(0L)(_ + _)
          val sb = new java.lang.StringBuilder(64)
          lum.foreach(l => sb.append(if (l.toLong * 64 > total) '1' else '0'))
          sb.toString
        }.orNull
        Row(id, h)
      }
    }(enc)
  }

  /** Visually-near-duplicate image pairs: aHash, then a simhash-style
    * banded join (4×16-bit bands — by pigeonhole, any pair at Hamming
    * distance ≤ 3 shares a clean band and is guaranteed a candidate;
    * beyond that the usual banded-LSH recall argument applies) and an
    * exact Hamming verify over candidates only. Identical-content
    * families should be exact-deduped first (q24): they collapse whole
    * bands and make the banded join's buckets quadratic in the family
    * size.
    */
  def aHashPairs(media: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64)
    val h = aHash(media).filter(col("ahash").isNotNull)
    val bands = h.select(col("media_id"), col("ahash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          substring(col("ahash"), b * 16 + 1, 16).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("ahash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.alias("a").join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        graft.functions.NativeExprs.hamming(col("ha"), col("hb")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
