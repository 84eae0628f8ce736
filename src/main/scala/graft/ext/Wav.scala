package graft.ext

/** Pure-JVM WAV (RIFF/PCM16) codec — the audio analogue of the PPM/PNG
  * image paths: real parse, real per-channel statistics, real
  * nearest-neighbor resample, no native library. Canonical-form PCM16
  * little-endian (the overwhelmingly common interchange layout; what
  * `ffmpeg -f wav -c pcm_s16le` and every sound card emit).
  *
  * Reference behavior being re-expressed: the multimodal-column contract
  * of the training-data pipeline — opaque `binary` payloads decoded
  * batch-wise into typed features, malformed input yielding None (an
  * auditable null row), never a task crash.
  */
object Wav {

  /** RIFF/WAVE magic probe. */
  def isWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
      payload(11) == 'E'

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def putLeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def putLeShort(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  /** Decoded clip: interleaved PCM16 samples (`samples.length =
    * frames × channels`).
    */
  final case class Clip(channels: Int, sampleRate: Int,
                        samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

  /** Encode interleaved PCM16 as a canonical 44-byte-header WAV. */
  def encode(clip: Clip): Array[Byte] = {
    require(clip.channels > 0, s"channels ${clip.channels}")
    require(clip.samples.length % clip.channels == 0,
      s"${clip.samples.length} samples not a multiple of ${clip.channels} channels")
    val dataLen = 2 * clip.samples.length
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes.copyToArray(out, 0)
    putLeInt(out, 4, 36 + dataLen)
    "WAVE".getBytes.copyToArray(out, 8)
    "fmt ".getBytes.copyToArray(out, 12)
    putLeInt(out, 16, 16) // PCM fmt chunk length
    putLeShort(out, 20, 1) // audio format 1 = PCM
    putLeShort(out, 22, clip.channels)
    putLeInt(out, 24, clip.sampleRate)
    putLeInt(out, 28, clip.sampleRate * clip.channels * 2) // byte rate
    putLeShort(out, 32, clip.channels * 2) // block align
    putLeShort(out, 34, 16) // bits per sample
    "data".getBytes.copyToArray(out, 36)
    putLeInt(out, 40, dataLen)
    var i = 0
    while (i < clip.samples.length) {
      putLeShort(out, 44 + 2 * i, clip.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Parse a PCM16 WAV: walks the chunk list (tolerates extra chunks
    * like LIST/INFO before or after `data`), rejects non-PCM or
    * non-16-bit payloads and any truncation with None — never a throw.
    */
  def decode(payload: Array[Byte]): Option[Clip] = {
    if (!isWav(payload) || payload.length < 44) return None
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    var off = 12
    // chunk walk; sizes are unsigned but a real clip fits in Int here —
    // negative/oversized sizes fall out via the bounds checks
    while (off + 8 <= payload.length && (dataOff < 0 || channels < 0)) {
      val id = new String(payload, off, 4, "US-ASCII")
      // RIFF sizes are unsigned 32-bit; do the bounds math in Long so a
      // crafted length near Int.MaxValue cannot wrap `off + 8 + len`
      // negative and slip past the truncation guard
      val lenL = leInt(payload, off + 4).toLong & 0xffffffffL
      if (off.toLong + 8 + lenL > payload.length) return None
      val len = lenL.toInt // ≤ payload.length after the guard
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = leShort(payload, off + 8)
          if (fmt != 1) return None // PCM only
          channels = leShort(payload, off + 10)
          rate = leInt(payload, off + 12)
          bits = leShort(payload, off + 22)
          if (channels <= 0 || rate <= 0 || bits != 16) return None
        case "data" =>
          dataOff = off + 8; dataLen = len
        case _ => // skip foreign chunk
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (channels <= 0 || dataOff < 0) return None
    val nSamples = dataLen / 2
    if (nSamples % channels != 0) return None
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      samples(i) = leShort(payload, dataOff + 2 * i).toShort
      i += 1
    }
    Some(Clip(channels, rate, samples))
  }

  /** Per-channel statistics:
    * [channels, sample_rate, frames, meanCh0, meanCh1, …] — integer-exact
    * sums until the final division, so a SQL oracle reproduces every
    * mean bit-for-bit from the source samples.
    */
  def stats(clip: Clip): Array[Double] = {
    val sums = new Array[Long](clip.channels)
    var i = 0
    while (i < clip.samples.length) {
      sums(i % clip.channels) += clip.samples(i)
      i += 1
    }
    val frames = clip.frames
    Array(clip.channels.toDouble, clip.sampleRate.toDouble,
      frames.toDouble) ++
      sums.map(s => if (frames == 0) 0.0 else s.toDouble / frames)
  }

  /** Nearest-neighbor resample to a target rate (the audio twin of
    * [[Multimodal.resampleRgb]]): output frame j takes input frame
    * `j * inRate / outRate` — integer arithmetic, deterministic, and the
    * standard zero-order-hold baseline a real pipeline would swap for a
    * windowed-sinc kernel.
    */
  def resample(clip: Clip, outRate: Int): Clip = {
    require(outRate > 0, s"outRate $outRate")
    require(clip.sampleRate > 0, s"sampleRate ${clip.sampleRate}")
    require(clip.channels > 0, s"channels ${clip.channels}")
    val inFrames = clip.frames
    val outFrames = (inFrames.toLong * outRate / clip.sampleRate).toInt
    val out = new Array[Short](outFrames * clip.channels)
    var j = 0
    while (j < outFrames) {
      val src = (j.toLong * clip.sampleRate / outRate).toInt
      var c = 0
      while (c < clip.channels) {
        out(j * clip.channels + c) = clip.samples(src * clip.channels + c)
        c += 1
      }
      j += 1
    }
    Clip(clip.channels, outRate, out)
  }
}
