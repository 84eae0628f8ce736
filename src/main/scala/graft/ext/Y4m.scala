package graft.ext

/** Pure-JVM YUV4MPEG2 ("Y4M") video codec — the video leg of the
  * multimodal suite (PPM/PNG/JPEG/GIF/BMP images, WAV audio, and now
  * moving pictures). Y4M is the standard UNCOMPRESSED video interchange
  * format (mjpegtools/ffmpeg `-f yuv4mpeg`): a plain-text stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<cs>\n`, then per frame a
  * `FRAME...\n` marker followed by raw planes. With colourspace `Cmono`
  * each frame is exactly `w·h` luma bytes — fully parseable with the
  * JDK alone, no native library.
  *
  * Reference behaviour this replaces: the reference repo has no media
  * path at all (SURVEY §2.10 [EXT]); the driver brief asks for video
  * frame-sampling plumbing with a REAL container. Y4M is that container:
  * real enough that ffmpeg can read what [[encode]] writes, simple
  * enough to decode deterministically here.
  *
  * Malformed-input contract (same as [[Wav]]/[[Png]]): [[decode]]
  * returns None on ANY malformation — bad magic, unparsable or missing
  * W/H, non-mono colourspace, zero/negative/overflowing dimensions,
  * truncated frame payload, junk after the last frame — and never
  * throws. All size arithmetic is done in Long so a crafted W/H near
  * Int.MaxValue cannot wrap a bounds check (the Wav round-7 lesson).
  */
object Y4m {

  /** A decoded mono video: `frames(i)` is frame i's `width*height` luma
    * plane, row-major.
    */
  final case class Video(width: Int, height: Int, fpsNum: Int,
                         fpsDen: Int, frames: Vector[Array[Byte]]) {
    require(width > 0 && height > 0, s"dims ${width}x$height")
    require(fpsNum > 0 && fpsDen > 0, s"fps $fpsNum:$fpsDen")
    def durationMs: Long =
      frames.length.toLong * 1000L * fpsDen / fpsNum
  }

  private val Magic = "YUV4MPEG2"
  private val FrameMagic = "FRAME"

  def isY4m(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= Magic.length + 1 &&
      Magic.indices.forall(i => payload(i) == Magic.charAt(i).toByte)

  /** Canonical stream: `YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 Cmono`. */
  def encode(v: Video): Array[Byte] = {
    val header = s"$Magic W${v.width} H${v.height} " +
      s"F${v.fpsNum}:${v.fpsDen} Ip A1:1 Cmono\n"
    val plane = v.width * v.height
    v.frames.foreach(f => require(f.length == plane,
      s"frame plane ${f.length} != $plane"))
    val out = new java.io.ByteArrayOutputStream(
      header.length + v.frames.length * (6 + plane))
    out.write(header.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val fm = (FrameMagic + "\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    v.frames.foreach { f => out.write(fm); out.write(f) }
    out.toByteArray
  }

  /** Parse a Y4M stream. Accepts any parameter order in the stream
    * header, ignores unknown parameters (X…, I…, A…), requires `Cmono`
    * (the only colourspace [[encode]] emits; C420 et al. → None, loudly
    * not silently wrong). Returns None on any malformation — never
    * throws.
    */
  def decode(payload: Array[Byte]): Option[Video] = {
    if (!isY4m(payload)) return None
    val nl0 = indexOf(payload, '\n'.toByte, 0)
    if (nl0 < 0) return None
    val header = new String(payload, 0, nl0,
      java.nio.charset.StandardCharsets.US_ASCII)
    val parts = header.split(" ").toList
    if (parts.isEmpty || parts.head != Magic) return None
    var w = -1L; var h = -1L; var fn = 25L; var fd = 1L
    var cs = "mono" // Y4M default colourspace is 4:2:0, but a stream
                    // without C is ambiguous across tools; we emit Cmono
                    // always and accept a missing C as mono for our own
                    // streams' sake — any EXPLICIT non-mono C rejects.
    val it = parts.tail.iterator
    while (it.hasNext) {
      val p = it.next()
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = parseLong(p.substring(1)).getOrElse(-1L)
        case 'H' => h = parseLong(p.substring(1)).getOrElse(-1L)
        case 'F' =>
          val c = p.indexOf(':')
          if (c < 0) return None
          fn = parseLong(p.substring(1, c)).getOrElse(-1L)
          fd = parseLong(p.substring(c + 1)).getOrElse(-1L)
        case 'C' => cs = p.substring(1)
        case _   => // Ip / A1:1 / Xcomment — ignored
      }
    }
    if (w <= 0 || h <= 0 || w > 65536L || h > 65536L) return None
    if (fn <= 0 || fd <= 0 || fn > Int.MaxValue || fd > Int.MaxValue)
      return None
    if (cs != "mono") return None
    val plane = w * h // Long: ≤ 2^32, no Int wrap
    if (plane > Int.MaxValue) return None
    val frames = Vector.newBuilder[Array[Byte]]
    var off: Long = nl0 + 1L
    while (off < payload.length) {
      // every frame starts with "FRAME[params]\n"
      if (off + FrameMagic.length > payload.length) return None
      var i = 0
      while (i < FrameMagic.length) {
        if (payload((off + i).toInt) != FrameMagic.charAt(i).toByte)
          return None
        i += 1
      }
      val nl = indexOf(payload, '\n'.toByte, (off + FrameMagic.length).toInt)
      if (nl < 0) return None
      val dataStart = nl + 1L
      if (dataStart + plane > payload.length) return None // truncated
      frames += java.util.Arrays.copyOfRange(
        payload, dataStart.toInt, (dataStart + plane).toInt)
      off = dataStart + plane
    }
    Some(Video(w.toInt, h.toInt, fn.toInt, fd.toInt, frames.result()))
  }

  /** Uniform temporal downsample: keep frames 0, n, 2n, … — the
    * frame-sampling stage of a video featurization pipeline.
    */
  def sampleEveryN(v: Video, n: Int): Video = {
    require(n >= 1, s"sample stride $n")
    v.copy(frames =
      v.frames.zipWithIndex.collect { case (f, i) if i % n == 0 => f })
  }

  /** Mean luma of one frame — integer sum, one exact division. */
  def meanLuma(frame: Array[Byte]): Double = {
    if (frame.isEmpty) return 0.0
    var s = 0L; var i = 0
    while (i < frame.length) { s += frame(i) & 0xff; i += 1 }
    s.toDouble / frame.length
  }

  private def indexOf(a: Array[Byte], b: Byte, from: Int): Int = {
    var i = from
    while (i < a.length) { if (a(i) == b) return i; i += 1 }
    -1
  }

  private def parseLong(s: String): Option[Long] =
    if (s.isEmpty || !s.forall(c => c >= '0' && c <= '9') ||
      s.length > 18) None
    else Some(java.lang.Long.parseLong(s))
}
