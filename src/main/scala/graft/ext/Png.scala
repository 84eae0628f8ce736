package graft.ext

import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG codec: 8-bit greyscale / truecolor / truecolor+alpha,
  * non-interlaced — the subset that covers the overwhelming majority of
  * real-corpus PNGs — built on `java.util.zip` (RFC 1950 zlib streams are
  * exactly what PNG's IDAT carries), with all five scanline filters
  * (None/Sub/Up/Average/Paeth) on both encode and decode.
  *
  * Mirrors the reference's multimodal intent (it treats media as opaque
  * payloads; see `extract_file.py`'s binary-object handling) but as a REAL
  * decode path: unlike JPEG (which needs a native DCT codec not present in
  * this container), PNG is losslessly decodable with the JDK alone, so the
  * decode → feature-extract → resize plumbing in [[Multimodal]] runs
  * end-to-end real for PNG exactly as it does for PPM.
  *
  * Malformed input contract (shared with [[Multimodal.ppmDecode]]): any
  * structural violation — bad signature, truncated chunk, CRC mismatch,
  * unsupported bit depth / interlace, inflate error, short pixel data —
  * returns None, never throws. A corrupt image in a 100 TB media lake must
  * yield an auditable null feature row, not a task crash.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Signature probe (cheap, for format dispatch). */
  def isPng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 &&
      (0 until 8).forall(i => payload(i) == Signature(i))

  private def u32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = (v >>> 24).toByte; b(i + 1) = (v >>> 16).toByte
    b(i + 2) = (v >>> 8).toByte; b(i + 3) = v.toByte
  }

  /** One chunk: length + type + data + CRC32(type ++ data). */
  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](12 + data.length)
    putU32(out, 0, data.length.toLong)
    System.arraycopy(t, 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    putU32(out, 8 + data.length, crc.getValue)
    out
  }

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // greyscale
    case 2 => 3 // truecolor
    case 6 => 4 // truecolor + alpha
    case _ => -1
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode 8-bit pixels (row-major, `channelsOf(colorType)` bytes per
    * pixel) as a non-interlaced PNG, applying scanline filter `filter`
    * (0–4) uniformly. The filter changes the compressed bytes, never the
    * decoded pixels — exposing it lets tests (and the oracle-gated query)
    * exercise every unfilter path.
    */
  def encode(width: Int, height: Int, pixels: Array[Byte],
             colorType: Int = 2, filter: Int = 0): Array[Byte] = {
    val ch = channelsOf(colorType)
    require(ch > 0, s"unsupported color type $colorType")
    require(filter >= 0 && filter <= 4, s"bad filter $filter")
    require(pixels.length == ch * width * height,
      s"pixel buffer ${pixels.length} != $ch*$width*$height")
    val stride = ch * width
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val rowOut = y * (1 + stride)
      raw(rowOut) = filter.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= ch) pixels(y * stride + i - ch) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val upLeft =
          if (y > 0 && i >= ch) pixels((y - 1) * stride + i - ch) & 0xff else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(rowOut + 1 + i) = v.toByte
        i += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width.toLong); putU32(ihdr, 4, height.toLong)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    val out = new java.io.ByteArrayOutputStream
    out.write(Signature)
    out.write(chunk("IHDR", ihdr))
    out.write(chunk("IDAT", zOut.toByteArray))
    out.write(chunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode a PNG to (width, height, RGB bytes). Greyscale is replicated
    * across R=G=B; alpha is dropped (features/resampling operate on the
    * color planes — compositing policy belongs to the caller). Returns
    * None for anything outside the supported subset or structurally
    * malformed; never throws.
    */
  def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isPng(payload)) return None
    try decodeChunks(payload)
    catch { case _: Throwable => None }
  }

  private def decodeChunks(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    var i = 8
    var width = -1; var height = -1; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream
    while (i + 12 <= p.length && !sawIend) {
      val len = u32(p, i)
      if (len > Int.MaxValue - 12 || i + 12 + len > p.length) return None
      val typ = new String(p, i + 4, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new CRC32
      crc.update(p, i + 4, 4 + len.toInt)
      if (crc.getValue != u32(p, i + 8 + len.toInt)) return None
      typ match {
        case "IHDR" =>
          if (sawIhdr || len != 13) return None
          sawIhdr = true
          width = u32(p, i + 8).toInt; height = u32(p, i + 12).toInt
          val bitDepth = p(i + 16) & 0xff
          colorType = p(i + 17) & 0xff
          val interlace = p(i + 20) & 0xff
          if (bitDepth != 8 || channelsOf(colorType) < 0 ||
            (p(i + 18) & 0xff) != 0 || (p(i + 19) & 0xff) != 0 ||
            interlace != 0) return None
        case "IDAT" =>
          if (!sawIhdr) return None
          idat.write(p, i + 8, len.toInt)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk: skip
      }
      i += 12 + len.toInt
    }
    if (!sawIhdr || !sawIend || width <= 0 || height <= 0) return None
    val ch = channelsOf(colorType)
    val stride = ch.toLong * width
    val rawLen = height.toLong * (1L + stride)
    // same adversarial-header guard as ppmDecode: reject before allocating
    if (rawLen > Int.MaxValue || 3L * width * height > Int.MaxValue)
      return None
    val raw = new Array[Byte](rawLen.toInt)
    val inflater = new Inflater
    inflater.setInput(idat.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      if (n == 0 && inflater.needsInput()) { inflater.end(); return None }
      off += n
    }
    inflater.end()
    if (off != raw.length) return None
    // unfilter in place into a packed pixel buffer
    val strideI = stride.toInt
    val px = new Array[Byte](height * strideI)
    var y = 0
    while (y < height) {
      val f = raw(y * (1 + strideI)) & 0xff
      if (f > 4) return None
      val rowIn = y * (1 + strideI) + 1
      var x = 0
      while (x < strideI) {
        val left = if (x >= ch) px(y * strideI + x - ch) & 0xff else 0
        val up = if (y > 0) px((y - 1) * strideI + x) & 0xff else 0
        val upLeft =
          if (y > 0 && x >= ch) px((y - 1) * strideI + x - ch) & 0xff else 0
        val v = (raw(rowIn + x) & 0xff) + (f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 => paeth(left, up, upLeft)
        })
        px(y * strideI + x) = v.toByte
        x += 1
      }
      y += 1
    }
    // normalize to RGB
    val rgb = colorType match {
      case 2 => px
      case 0 =>
        val out = new Array[Byte](3 * width * height)
        var j = 0
        while (j < px.length) {
          out(3 * j) = px(j); out(3 * j + 1) = px(j); out(3 * j + 2) = px(j)
          j += 1
        }
        out
      case 6 =>
        val out = new Array[Byte](3 * width * height)
        var j = 0
        while (j < width * height) {
          out(3 * j) = px(4 * j); out(3 * j + 1) = px(4 * j + 1)
          out(3 * j + 2) = px(4 * j + 2)
          j += 1
        }
        out
    }
    Some((width, height, rgb))
  }
}
