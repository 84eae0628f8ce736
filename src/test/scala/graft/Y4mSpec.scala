package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Multimodal, Y4m}

/** Y4M video codec semantics: lossless roundtrip, header tolerance,
  * malformed-input safety (None, never a throw — incl. the Long-math
  * bounds that foiled Wav in round 7), frame sampling, and the
  * Spark-side media-table + frame-sample stages.
  */
class Y4mSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def video(frames: Int, w: Int = 4, h: Int = 3) =
    Y4m.Video(w, h, 25, 1, Vector.tabulate(frames)(f =>
      Array.tabulate[Byte](w * h)(i => ((f * 37 + i * 11) % 256).toByte)))

  test("encode/decode roundtrip is bit-exact, incl. zero frames") {
    for (n <- Seq(0, 1, 6)) {
      val v = video(n)
      val back = Y4m.decode(Y4m.encode(v)).get
      assert(back.width === 4 && back.height === 3)
      assert(back.fpsNum === 25 && back.fpsDen === 1)
      assert(back.frames.length === n)
      back.frames.zip(v.frames).foreach { case (a, b) =>
        assert(a.toSeq === b.toSeq)
      }
    }
  }

  test("header parse: any param order, unknown params ignored, FRAME " +
       "params tolerated") {
    val plane = Array.tabulate[Byte](6)(_.toByte)
    val s = "YUV4MPEG2 Cmono H2 W3 Xcomment F30:1\nFRAME Ixyz\n"
      .getBytes("US-ASCII") ++ plane
    val v = Y4m.decode(s).get
    assert(v.width === 3 && v.height === 2 && v.fpsNum === 30)
    assert(v.frames.head.toSeq === plane.toSeq)
  }

  test("malformed inputs return None, never throw") {
    val ok = Y4m.encode(video(2))
    assert(Y4m.decode(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(Y4m.decode("YUV4MPEG2 W4 H3\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0)).isEmpty, "truncated frame payload")
    assert(Y4m.decode("YUV4MPEG2 W0 H3 Cmono\nFRAME\n"
      .getBytes("US-ASCII")).isEmpty, "zero width")
    assert(Y4m.decode("YUV4MPEG2 W4 H3 C420\nFRAME\n"
      .getBytes("US-ASCII") ++ new Array[Byte](18)).isEmpty,
      "non-mono colourspace rejects loudly")
    assert(Y4m.decode(
      "YUV4MPEG2 W99999999999999 H3 Cmono\n".getBytes("US-ASCII"))
      .isEmpty, "overlong dimension cannot wrap the bounds check")
    assert(Y4m.decode("YUV4MPEG2 W65536 H65536 Cmono\nFRAME\n"
      .getBytes("US-ASCII")).isEmpty,
      "plane size > Int.MaxValue rejected in Long math")
    assert(Y4m.decode(ok.dropRight(1)).isEmpty, "last-byte truncation")
    assert(Y4m.decode(ok ++ Array[Byte]('F')).isEmpty,
      "junk after last frame")
    // every prefix of a valid stream parses to None or a valid video —
    // never throws (the Wav round-7 lesson, locked for Y4M from day one)
    (0 until ok.length).foreach(n => Y4m.decode(ok.take(n)))
  }

  test("sampleEveryN keeps frames 0, n, 2n, … and meanLuma is the " +
       "exact integer mean") {
    val v = video(6)
    val s = Y4m.sampleEveryN(v, 2)
    assert(s.frames.length === 3)
    assert(s.frames(1).toSeq === v.frames(2).toSeq)
    val f = Array[Byte](0, -1, 10) // -1 reads as 255 unsigned
    assert(Y4m.meanLuma(f) === (0 + 255 + 10).toDouble / 3)
    assert(Y4m.meanLuma(Array.emptyByteArray) === 0.0)
  }

  test("asY4mMediaTable: deterministic payload, real container, " +
       "per-frame cycled pixels; sampleFrames drops malformed payloads " +
       "instead of crashing") {
    val docs = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asY4mMediaTable(docs, "doc_id", "text",
      4, 2, 3)
    val rows = media.orderBy("media_id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("video/y4m", "video/y4m"))
    val v1 = Y4m.decode(rows(0).getAs[Array[Byte]](2)).get
    assert(v1.frames.length === 3)
    // frame f pixel i = text byte (f*8 + i) mod 6
    assert(v1.frames(1)(0) === 'c'.toByte, "frame 1 starts at byte 8%6=2")
    assert(v1.frames(0).toSeq ===
      "abcdefab".getBytes("UTF-8").toSeq)
    val v2 = Y4m.decode(rows(1).getAs[Array[Byte]](2)).get
    assert(v2.frames.forall(_.forall(_ == 0)), "empty text → zero planes")

    val corrupted = media.withColumn("payload",
      when(col("media_id") === 2L, lit("junk".getBytes("UTF-8")))
        .otherwise(col("payload")))
    val sampled = Multimodal.sampleFrames(corrupted, 2)
      .orderBy("media_id", "frame_idx").collect()
    assert(sampled.map(r => (r.getLong(0), r.getInt(1))).toSeq ===
      Seq((1L, 0), (1L, 2)), "frames 0 and 2 of doc 1; doc 2 dropped")
    val expected0 = "abcdefab".getBytes("UTF-8").map(_ & 0xff).sum / 8.0
    assert(sampled(0).getDouble(4) === expected0)
  }
}
