package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Multimodal, Wav}

/** WAV codec semantics: lossless PCM16 roundtrip, chunk-walk tolerance,
  * malformed-input safety, exact stats, resample behavior, and the
  * Spark-side decode/resample stages.
  */
class WavSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def clip(n: Int, ch: Int = 1, rate: Int = 8000) =
    Wav.Clip(ch, rate,
      Array.tabulate[Short](n * ch)(i => ((i * 997) % 65536 - 32768).toShort))

  test("encode/decode roundtrip is bit-exact (mono and stereo)") {
    for (ch <- Seq(1, 2)) {
      val c = clip(128, ch)
      val back = Wav.decode(Wav.encode(c)).get
      assert(back.channels === ch && back.sampleRate === 8000)
      assert(back.samples.toSeq === c.samples.toSeq)
    }
  }

  test("chunk walk tolerates foreign chunks and word alignment") {
    val c = clip(16)
    val enc = Wav.encode(c)
    // splice an odd-length LIST chunk between fmt and data
    val info = "LIST".getBytes ++ Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val spliced = enc.slice(0, 36) ++ info ++ enc.slice(36, enc.length)
    // fix the RIFF size field
    val fixed = spliced.clone()
    val riffLen = spliced.length - 8
    fixed(4) = (riffLen & 0xff).toByte
    fixed(5) = ((riffLen >> 8) & 0xff).toByte
    fixed(6) = ((riffLen >> 16) & 0xff).toByte
    fixed(7) = ((riffLen >> 24) & 0xff).toByte
    val back = Wav.decode(fixed).get
    assert(back.samples.toSeq === c.samples.toSeq)
  }

  test("malformed payloads → None, never a throw") {
    val good = Wav.encode(clip(16))
    assert(Wav.decode(good.take(30)).isEmpty, "truncated header")
    assert(Wav.decode(good.take(50)).isEmpty, "truncated data")
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float format tag
    assert(Wav.decode(nonPcm).isEmpty, "non-PCM format")
    val badBits = good.clone(); badBits(34) = 8
    assert(Wav.decode(badBits).isEmpty, "8-bit payload")
    assert(Wav.decode("RIFFxxxxWAVE".getBytes).isEmpty, "no chunks")
    assert(Wav.decode(Array[Byte](1, 2, 3)).isEmpty, "garbage")
    assert(!Wav.isWav("P6\n1 1\n255\n".getBytes))
    // chunk length near Int.MaxValue: `off + 8 + len` must not wrap
    // negative and slip past the truncation guard (Long bounds math)
    val overflow = good.clone()
    overflow(40) = 0xf0.toByte; overflow(41) = 0xff.toByte
    overflow(42) = 0xff.toByte; overflow(43) = 0x7f.toByte // data len 0x7ffffff0
    assert(Wav.decode(overflow).isEmpty, "overflowing chunk length")
    val unsigned = good.clone()
    unsigned(40) = 0xff.toByte; unsigned(41) = 0xff.toByte
    unsigned(42) = 0xff.toByte; unsigned(43) = 0xff.toByte // len 0xffffffff
    assert(Wav.decode(unsigned).isEmpty, "unsigned-max chunk length")
  }

  test("stats: integer-exact per-channel means") {
    // stereo: ch0 constant 100, ch1 constant -200
    val c = Wav.Clip(2, 8000,
      Array.tabulate[Short](64)(i => if (i % 2 == 0) 100 else -200))
    val s = Wav.stats(c)
    assert(s.toSeq === Seq(2.0, 8000.0, 32.0, 100.0, -200.0))
  }

  test("resample: identity at same rate, half rate keeps every other " +
       "frame") {
    val c = clip(32)
    assert(Wav.resample(c, 8000).samples.toSeq === c.samples.toSeq)
    val half = Wav.resample(c, 4000)
    assert(half.frames === 16 && half.sampleRate === 4000)
    assert(half.samples.toSeq ===
      c.samples.toSeq.zipWithIndex.collect { case (v, i) if i % 2 == 0 => v })
  }

  test("audioFrames: exact windowed energy, hop/len geometry, non-WAV " +
       "skipped") {
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val media = Multimodal.asWavMediaTable(docs, "doc_id", "text",
      frames = 8, sampleRate = 8000)
    // samples: bytes 97,98,99,100 cycled → (b−128)·256
    val s = "abcdabcd".map(c => ((c - 128) * 256).toLong)
    // frameLen 4, hop 2 → windows at 0,2,4 (window at 6 would overrun)
    val frames = Multimodal.audioFrames(media, frameLen = 4, hop = 2)
      .orderBy("frame_no").collect()
    assert(frames.length === 3)
    frames.zipWithIndex.foreach { case (r, f) =>
      val exp = (f * 2 until f * 2 + 4).map(i => s(i) * s(i)).sum
      assert(r.getInt(1) === f && r.getInt(2) === 4 &&
        r.getLong(3) === exp)
    }
    // a non-WAV payload contributes no frames
    val mixed = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(Multimodal.audioFrames(mixed, 4, 2).isEmpty)
  }

  test("Spark path: decodeFeatures real stats; resampleAudio re-encodes " +
       "at the target rate") {
    val docs = Seq((1L, "abcd"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asWavMediaTable(docs, "doc_id", "text",
      frames = 64, sampleRate = 16000)
    val feats = Multimodal.decodeFeatures(media).orderBy("media_id")
      .collect()
    val f1 = feats(0).getSeq[Double](feats(0).fieldIndex("feature"))
    // "abcd" cycled: bytes 97..100 → mean sample ((97+98+99+100)/4−128)·256
    assert(f1.toSeq === Seq(1.0, 16000.0, 64.0, (98.5 - 128.0) * 256.0))
    val f2 = feats(1).getSeq[Double](feats(1).fieldIndex("feature"))
    assert(f2.toSeq === Seq(1.0, 16000.0, 64.0, 0.0), "empty text → silence")

    val res = Multimodal.resampleAudio(media, 8000).orderBy("media_id")
      .collect()
    res.foreach { r =>
      val back = Wav.decode(r.getAs[Array[Byte]]("payload")).get
      assert(back.sampleRate === 8000 && back.frames === 32)
      assert(r.getAs[org.apache.spark.sql.Row]("meta")
        .getAs[Long]("duration_ms") === 4L)
    }
  }
}
