package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Multimodal

/** Multimodal plumbing: schema/row-count contracts of the batched
  * decode / resize / frame-sample stages, plus the real codec paths
  * (PPM here, PNG in PngSpec, JPEG via the JDK's ImageIO below);
  * non-image formats stay loud stubs behind the same plumbing.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Tables.load(spark, TestSpark.sf0001, "documents"), "doc_id", "text")
    .cache()

  test("media table carries binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName === "binary")
    val meta = media.schema("meta").dataType
    assert(meta.typeName === "struct")
    assert(media.filter(col("payload").isNull).isEmpty)
  }

  test("decodeFeatures: row-count preserving, deterministic features") {
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() === media.count())
    assert(feats.schema.fieldNames.toSeq ===
      Seq("media_id", "byte_len", "feature"))
    val r = feats.orderBy("media_id").head()
    assert(r.getAs[Seq[Double]]("feature").length === 4)
    // deterministic across runs
    val again = Multimodal.decodeFeatures(media).orderBy("media_id").head()
    assert(r === again)
  }

  test("resize: row-count preserving, metadata rewritten to target dims") {
    val out = Multimodal.resize(media, 640, 480)
    assert(out.count() === media.count())
    val m = out.select("meta.width", "meta.height").distinct().collect()
    assert(m.length === 1 && m(0).getInt(0) === 640 && m(0).getInt(1) === 480)
    // payload shrinks or holds, never grows
    val grew = out.alias("o").join(media.alias("i"), "media_id")
      .filter(length(col("o.payload")) > length(col("i.payload")))
    assert(grew.isEmpty)
  }

  test("PPM codec: encode/decode roundtrip, header grammar, malformed " +
       "safety") {
    val rgb = Array.tabulate(3 * 4 * 2)(i => (i * 7 % 256).toByte)
    val enc = Multimodal.ppmEncode(4, 2, rgb)
    assert(Multimodal.isPpm(enc))
    val Some((w, h, px)) = Multimodal.ppmDecode(enc)
    assert(w === 4 && h === 2 && px.toSeq === rgb.toSeq)
    // comments + extra whitespace in the header are legal PPM
    val weird = ("P6 # comment\n  4\t2 # again\n255\n")
      .getBytes("US-ASCII") ++ rgb
    val Some((w2, h2, px2)) = Multimodal.ppmDecode(weird)
    assert(w2 === 4 && h2 === 2 && px2.toSeq === rgb.toSeq)
    // malformed payloads → None, never a throw
    assert(Multimodal.ppmDecode("P6\n4 2\n255\n".getBytes("US-ASCII"))
      .isEmpty, "truncated pixel data")
    assert(Multimodal.ppmDecode("P6\n-1 2\n255\nxx".getBytes("US-ASCII"))
      .isEmpty, "bad dims")
    assert(Multimodal.ppmDecode(Array[Byte]('P', '5')).isEmpty,
      "wrong magic")
  }

  test("PPM path end-to-end: real decode features and real resize") {
    val docs = Seq((1L, "abcdef"), (2L, "zz")).toDF("doc_id", "text")
    val media = Multimodal.asPpmMediaTable(docs, "doc_id", "text", 4, 4)
    val feats = Multimodal.decodeFeatures(media).orderBy("media_id")
      .collect()
    // doc 2: every byte 'z' (122) cycled → all three channel means = 122
    val f2 = feats(1).getSeq[Double](feats(1).fieldIndex("feature"))
    assert(f2 === Seq(4.0, 4.0, 122.0, 122.0, 122.0))
    // doc 1: 48 plane bytes cycle "abcdef" (97..102); R channel = bytes
    // 0,3,…,45 → cycle [a,d] → mean (97+100)/2
    val f1 = feats(0).getSeq[Double](feats(0).fieldIndex("feature"))
    assert(f1 === Seq(4.0, 4.0, (97 + 100) / 2.0, (98 + 101) / 2.0,
      (99 + 102) / 2.0))

    val shrunk = Multimodal.resize(media, 2, 2).orderBy("media_id").collect()
    val m = shrunk(1)
    assert(m.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("mime") === "image/x-portable-pixmap")
    val Some((rw, rh, rpx)) =
      Multimodal.ppmDecode(m.getAs[Array[Byte]]("payload"))
    assert(rw === 2 && rh === 2 && rpx.length === 12)
    assert(rpx.forall(_ == 'z'.toByte), "uniform image stays uniform")
  }

  test("resizeWithFeatures ≡ resize → decodeFeatures, with one decode") {
    // PPM media (real path) AND stub media (non-PPM path) through both
    // formulations: the fused operator must be bit-identical to the
    // two-stage composition on payload, metadata, and feature.
    val docs = Seq((1L, "abcdef"), (2L, "zz"), (3L, "")).toDF("doc_id", "text")
    for (m <- Seq(Multimodal.asPpmMediaTable(docs, "doc_id", "text", 4, 4),
                  media.limit(50))) {
      val fused = Multimodal.resizeWithFeatures(m, 2, 2)
        .orderBy("media_id").collect()
      val resized = Multimodal.resize(m, 2, 2)
      val composed = resized
        .join(Multimodal.decodeFeatures(resized), "media_id")
        .select("media_id", "media_type", "payload", "meta", "byte_len",
          "feature")
        .orderBy("media_id").collect()
      assert(fused.length === composed.length)
      fused.zip(composed).foreach { case (f, c) =>
        assert(f.getLong(0) === c.getLong(0))
        assert(f.getString(1) === c.getString(1))
        assert(f.getAs[Array[Byte]](2).toSeq === c.getAs[Array[Byte]](2).toSeq)
        assert(f.get(3) === c.get(3))
        assert(f.getLong(4) === c.getLong(4))
        assert(Option(f.getSeq[Double](5)) === Option(c.getSeq[Double](5)))
      }
    }
  }

  test("JPEG codec: roundtrip within tolerance, probe, malformed safety") {
    // smooth gradient (JPEG-friendly): per-pixel error stays small
    val rgb = Array.tabulate(3 * 16 * 16) { i =>
      val p = i / 3
      (((p % 16) * 8 + (p / 16) * 8) & 0xff).toByte
    }
    val enc = Multimodal.jpegEncode(16, 16, rgb)
    assert(Multimodal.isJpeg(enc))
    assert(!Multimodal.isPpm(enc) && !graft.ext.Png.isPng(enc))
    val Some((w, h, back)) = Multimodal.jpegDecode(enc)
    assert(w === 16 && h === 16 && back.length === rgb.length)
    // lossy, but channel means survive: bound mean |err| per channel
    for (c <- 0 until 3) {
      val exp = rgb.indices.collect { case i if i % 3 == c => rgb(i) & 0xff }
      val got = back.indices.collect { case i if i % 3 == c => back(i) & 0xff }
      val meanErr = math.abs(exp.sum.toDouble / exp.length -
        got.sum.toDouble / got.length)
      assert(meanErr <= 4.0, s"channel $c mean err $meanErr")
    }
    // malformed payloads → None, never a throw
    assert(Multimodal.jpegDecode(enc.take(20)).isEmpty, "truncated stream")
    assert(Multimodal.jpegDecode(
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x00, 0x01))
      .isEmpty, "garbage after SOI")
    assert(!Multimodal.isJpeg(Array[Byte](0x50, 0x36)), "wrong magic")
  }

  test("GIF codec: gray-palette roundtrip is BIT-exact, probe, " +
       "malformed safety") {
    val gray = Array.tabulate(16 * 16)(i => ((i * 7) & 0xff).toByte)
    val enc = Multimodal.gifEncode(16, 16, gray)
    assert(Multimodal.isGif(enc))
    assert(!Multimodal.isJpeg(enc) && !Multimodal.isBmp(enc))
    val Some((w, h, back)) = Multimodal.jpegDecode(enc)
    assert(w === 16 && h === 16)
    // every decoded pixel is (g, g, g) for the exact source level
    for (p <- gray.indices; c <- 0 until 3)
      assert(back(3 * p + c) === gray(p), s"pixel $p channel $c")
    assert(Multimodal.jpegDecode(enc.take(12)).isEmpty, "truncated stream")
    assert(!Multimodal.isGif("GIF9".getBytes), "wrong magic")
  }

  test("BMP codec: 24-bit roundtrip is BIT-exact, probe, malformed " +
       "safety") {
    val rgb = Array.tabulate(3 * 16 * 16)(i => ((i * 13) & 0xff).toByte)
    val enc = Multimodal.bmpEncode(16, 16, rgb)
    assert(Multimodal.isBmp(enc))
    assert(!Multimodal.isGif(enc) && !Multimodal.isPpm(enc))
    val Some((w, h, back)) = Multimodal.jpegDecode(enc)
    assert(w === 16 && h === 16)
    assert(back.toSeq === rgb.toSeq, "BMP roundtrip must be lossless")
    assert(Multimodal.jpegDecode(enc.take(10)).isEmpty, "truncated stream")
    assert(!Multimodal.isBmp(Array[Byte]('B', 'A')), "wrong magic")
  }

  test("JPEG path end-to-end: decode features within tolerance, resize " +
       "re-encodes as JPEG") {
    val docs = Seq((1L, "abcdef"), (2L, "zz")).toDF("doc_id", "text")
    val jm = Multimodal.asJpegMediaTable(docs, "doc_id", "text", 16, 16)
    val feats = Multimodal.decodeFeatures(jm).orderBy("media_id").collect()
    // doc 2: uniform 'z' plane — even lossy JPEG holds a flat image near
    // exactly (DC-only blocks); channel means within the q69 bound
    val f2 = feats(1).getSeq[Double](feats(1).fieldIndex("feature"))
    assert(f2(0) === 16.0 && f2(1) === 16.0)
    for (c <- 2 to 4)
      assert(math.abs(f2(c) - 122.0) <= 4.0, s"uniform mean ch$c ${f2(c)}")
    // resize keeps the arriving format: mime + magic stay JPEG
    val shrunk = Multimodal.resize(jm, 8, 8).orderBy("media_id").collect()
    shrunk.foreach { r =>
      assert(r.getAs[org.apache.spark.sql.Row]("meta")
        .getAs[String]("mime") === "image/jpeg")
      assert(Multimodal.isJpeg(r.getAs[Array[Byte]]("payload")))
    }
  }

  test("frameSample: row-expanding, n frames per non-empty payload") {
    val frames = Multimodal.frameSample(media, 4)
    assert(frames.schema.fieldNames.toSeq ===
      Seq("media_id", "frame_no", "frame"))
    val perDoc = frames.groupBy("media_id").count()
    assert(perDoc.filter(col("count") =!= 4).isEmpty)
    assert(frames.count() === media.count() * 4)
  }

  test("aHash: 64-bit string, identical images collide, a local edit " +
    "stays within a small Hamming radius, garbage hashes to null") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "")).toDF("doc_id", "text")
    val ppm = Multimodal.asPpmMediaTable(docs, "doc_id", "text", 16, 16)
    val h = Multimodal.aHash(ppm).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(h.values.forall(v => v == null || (v.length == 64 &&
      v.forall(c => c == '0' || c == '1'))))
    assert(h(1L) == h(2L)) // identical content ⇒ identical hash
    val ham = h(1L).zip(h(3L)).count { case (a, b) => a != b }
    assert(ham <= 16, s"one-word edit moved $ham of 64 bits")
    // exact-dup pair must survive the banded join at Hamming 0
    val pairs = Multimodal.aHashPairs(ppm, maxHamming = 0).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getLong(2) == 0L))
    // undecodable payload → null hash
    val junk = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    assert(Multimodal.aHash(junk).collect()(0).isNullAt(1))
  }
}
