package graft.imagecodec

/** Deterministic, dependency-free image codecs for the sandbox.
  *
  * The container has no image libraries, so the payload path is made real
  * at the *byte and invariant* level: a lossless uncompressed format
  * ("bmp" — a faithful 54-byte-header BGR windows bitmap), a lossless
  * PNG-shaped container ("png" — raw pixels behind a fixed header; decode
  * is bit-exact), and a deterministic lossy codec ("xjpg") that quantizes
  * pixel values (losing low bits) so the PSNR≥40dB invariant
  * (BASELINE.json input_hint) is a real measurement, not a tautology.
  *
  * All functions are pure and allocation-bounded so they are safe inside
  * Catalyst expressions and `mapPartitions` at executor scale.
  */
object ImageCodec {

  /** Deterministic pixel pattern for image i: gray8 pixels derived from a
    * 64-bit mix of (seed, x, y). Returns row-major w*h bytes. */
  def syntheticPixels(seed: Long, w: Int, h: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = (mix64(seed ^ (y.toLong << 32) ^ x.toLong) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    px
  }

  /** splitmix64 finalizer — stable across JVMs, no java.util.Random. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // ---------------------------------------------------------------- BMP --
  // Real BI_RGB 8->24bpp bottom-up BMP. Lossless round-trip.

  def encodeBmp(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val rowSize = (w * 3 + 3) / 4 * 4
    val dataSize = rowSize * h
    val out = new Array[Byte](54 + dataSize)
    putU16(out, 0, 0x4d42) // 'BM'
    putU32(out, 2, 54 + dataSize)
    putU32(out, 10, 54)
    putU32(out, 14, 40) // BITMAPINFOHEADER
    putU32(out, 18, w)
    putU32(out, 22, h)
    putU16(out, 26, 1)
    putU16(out, 28, 24)
    putU32(out, 34, dataSize)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = px((h - 1 - y) * w + x) // bottom-up
        val o = 54 + y * rowSize + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  def decodeBmp(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val w = getU32(bytes, 18)
    val h = getU32(bytes, 22)
    val rowSize = (w * 3 + 3) / 4 * 4
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px((h - 1 - y) * w + x) = bytes(54 + y * rowSize + x * 3)
        x += 1
      }
      y += 1
    }
    (px, w, h)
  }

  // ---------------------------------------------------------------- PNG --
  // PNG-shaped container: real 8-byte PNG signature + dims, raw gray8
  // payload (stored, not deflated — no external zlib dependency needed for
  // determinism). Decode is bit-exact.

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  def encodePng(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](16 + px.length)
    System.arraycopy(PngSig, 0, out, 0, 8)
    putU32(out, 8, w)
    putU32(out, 12, h)
    System.arraycopy(px, 0, out, 16, px.length)
    out
  }

  def decodePng(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(bytes.length >= 16 && bytes(0) == PngSig(0) && bytes(1) == 'P', "not a PNG")
    val w = getU32(bytes, 8)
    val h = getU32(bytes, 12)
    val px = new Array[Byte](w * h)
    System.arraycopy(bytes, 16, px, 0, w * h)
    (px, w, h)
  }

  // --------------------------------------------------------------- XJPG --
  // Deterministic lossy codec: 4-bit quantization with midpoint
  // reconstruction. Max per-pixel error = 8/255 → PSNR ≈ 20*log10(255/~4.6)
  // ≈ 35dB worst-case uniform; actual measured PSNR on the synthetic
  // pattern is ~42dB because quantization error is uniform(-8..7) with
  // RMSE≈4.6 → 34.9dB... so we use 5-bit quant (max err 4, RMSE≈2.3 →
  // ~40.9dB) to sit just above the 40dB bar — the invariant test does the
  // real measurement.

  def encodeXjpg(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](12 + px.length)
    out(0) = 'X'; out(1) = 'J'; out(2) = 'P'; out(3) = 'G'
    putU32(out, 4, w)
    putU32(out, 8, h)
    var i = 0
    while (i < px.length) {
      out(12 + i) = ((px(i) & 0xf8)).toByte // keep top 5 bits
      i += 1
    }
    out
  }

  def decodeXjpg(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    require(bytes.length >= 12 && bytes(0) == 'X' && bytes(1) == 'J', "not an XJPG")
    val w = getU32(bytes, 4)
    val h = getU32(bytes, 8)
    val px = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      px(i) = ((bytes(12 + i) & 0xf8) | 0x04).toByte // midpoint reconstruction
      i += 1
    }
    (px, w, h)
  }

  // ------------------------------------------------------------ generic --

  /** Format sniff from magic bytes (reference analog: suffix dispatch at
    * csinsights/client/dblpclient.py:401-409). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
    else if (bytes.length >= 4 && bytes(0) == 'X' && bytes(1) == 'J') "xjpg"
    else "unknown"

  def decode(bytes: Array[Byte]): (Array[Byte], Int, Int) = sniffFormat(bytes) match {
    case "bmp"  => decodeBmp(bytes)
    case "png"  => decodePng(bytes)
    case "xjpg" => decodeXjpg(bytes)
    case f      => throw new IllegalArgumentException(s"undecodable format: $f")
  }

  def encode(px: Array[Byte], w: Int, h: Int, fmt: String): Array[Byte] = fmt match {
    case "bmp"  => encodeBmp(px, w, h)
    case "png"  => encodePng(px, w, h)
    case "xjpg" => encodeXjpg(px, w, h)
    case f      => throw new IllegalArgumentException(s"unencodable format: $f")
  }

  /** Dimensions without full decode — header-only read. */
  def decodeDims(bytes: Array[Byte]): (Int, Int) = sniffFormat(bytes) match {
    case "bmp"  => (getU32(bytes, 18), getU32(bytes, 22))
    case "png"  => (getU32(bytes, 8), getU32(bytes, 12))
    case "xjpg" => (getU32(bytes, 4), getU32(bytes, 8))
    case f      => throw new IllegalArgumentException(s"unknown format: $f")
  }

  def decodeWidthOf(bytes: Array[Byte]): Int = decodeDims(bytes)._1
  def decodeHeightOf(bytes: Array[Byte]): Int = decodeDims(bytes)._2

  /** Average-hash perceptual hash over an 8x8 downsample (DCT-free for
    * bit-determinism; SURVEY.md §7 "custom vs built-in"). */
  def averageHash(px: Array[Byte], w: Int, h: Int): Long = {
    val cell = new Array[Long](64)
    val cnt = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        cell(cy * 8 + cx) += (px(y * w + x) & 0xff)
        cnt(cy * 8 + cx) += 1
        x += 1
      }
      y += 1
    }
    var sum = 0L; var n = 0L
    var i = 0
    while (i < 64) { if (cnt(i) > 0) { cell(i) /= cnt(i); sum += cell(i); n += 1 }; i += 1 }
    val mean = if (n == 0) 0 else sum / n
    var hash = 0L
    i = 0
    while (i < 64) { if (cnt(i) > 0 && cell(i) > mean) hash |= (1L << i); i += 1 }
    hash
  }

  def phashOfEncoded(bytes: Array[Byte]): Long = {
    val (px, w, h) = decode(bytes)
    averageHash(px, w, h)
  }

  /** 90° clockwise rotation of a decoded gray8 image: output is h×w,
    * out(y, x) = in(h-1-x, y). */
  def rotate90(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < w) { // output rows: h_out = w
      var x = 0
      while (x < h) { // output cols: w_out = h
        out(y * h + x) = px((h - 1 - x) * w + y)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Horizontal mirror of a decoded gray8 image (same dims). */
  def flipHoriz(px: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = px(y * w + (w - 1 - x)); x += 1 }
      y += 1
    }
    out
  }

  private def minUnsigned(a: Long, b: Long): Long =
    if (java.lang.Long.compareUnsigned(a, b) <= 0) a else b

  /** Dihedral-canonical perceptual hash: the unsigned-min [[averageHash]]
    * over all 8 rotations/mirrors of the image — two images that are
    * rotations or mirrors of each other get the SAME value (the orbit is
    * a group: rot90(px)'s 8 variants are px's 8 variants), so rotated or
    * flipped re-posts collapse in the same banded hamming engine plain
    * phash uses. Exact for any dims (each orbit member is hashed from
    * its own pixels, never by permuting another member's bits). */
  def dihedralMinHash(px: Array[Byte], w: Int, h: Int): Long = {
    var best = averageHash(px, w, h)
    var cur = px; var cw = w; var ch = h
    var r = 0
    while (r < 3) {
      cur = rotate90(cur, cw, ch); val t = cw; cw = ch; ch = t
      best = minUnsigned(best, averageHash(cur, cw, ch)); r += 1
    }
    cur = flipHoriz(px, w, h); cw = w; ch = h
    best = minUnsigned(best, averageHash(cur, cw, ch))
    r = 0
    while (r < 3) {
      cur = rotate90(cur, cw, ch); val t = cw; cw = ch; ch = t
      best = minUnsigned(best, averageHash(cur, cw, ch)); r += 1
    }
    best
  }

  def phashD4OfEncoded(bytes: Array[Byte]): Long = {
    val (px, w, h) = decode(bytes)
    dihedralMinHash(px, w, h)
  }

  /** Deterministic nearest-neighbor resize of a decoded gray8 image. */
  def resizeNearest(px: Array[Byte], w: Int, h: Int, ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      val sy = (y.toLong * h / oh).toInt
      var x = 0
      while (x < ow) {
        out(y * ow + x) = px(sy * w + (x.toLong * w / ow).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** resize an ENCODED payload, re-encoding in the same format (the
    * multimodal resize transform; deterministic, dependency-free). */
  def resizeEncoded(bytes: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val fmt = sniffFormat(bytes)
    val (px, w, h) = decode(bytes)
    encode(resizeNearest(px, w, h, ow, oh), ow, oh, fmt)
  }

  /** Uniform letterbox pad: a `fill` border of (top, bottom, left, right)
    * pixels around the image — the synthetic twin of the black bars a
    * re-encoder adds when it letterboxes to a target aspect. */
  def pad(px: Array[Byte], w: Int, h: Int,
      t: Int, b: Int, l: Int, r: Int, fill: Byte): Array[Byte] = {
    val ow = w + l + r
    val oh = h + t + b
    val out = Array.fill[Byte](ow * oh)(fill)
    var y = 0
    while (y < h) {
      System.arraycopy(px, y * w, out, (y + t) * ow + l, w)
      y += 1
    }
    out
  }

  /** Borders packed as t<<24 | b<<16 | l<<8 | r (each 0..255). */
  def packBorders(t: Int, b: Int, l: Int, r: Int): Int =
    ((t & 0xff) << 24) | ((b & 0xff) << 16) | ((l & 0xff) << 8) | (r & 0xff)

  /** pad an ENCODED payload with a black (0) letterbox border, re-encoding
    * in the same format; `packed` = [[packBorders]]. */
  def padEncoded(bytes: Array[Byte], packed: Int): Array[Byte] = {
    val fmt = sniffFormat(bytes)
    val (px, w, h) = decode(bytes)
    val t = (packed >>> 24) & 0xff
    val b = (packed >>> 16) & 0xff
    val l = (packed >>> 8) & 0xff
    val r = packed & 0xff
    encode(pad(px, w, h, t, b, l, r, 0.toByte), w + l + r, h + t + b, fmt)
  }

  /** Crop `(top, bottom, left, right)` border pixels off an image. */
  def crop(px: Array[Byte], w: Int, h: Int,
      t: Int, b: Int, l: Int, r: Int): Array[Byte] = {
    val ow = w - l - r
    val oh = h - t - b
    require(ow > 0 && oh > 0, s"crop $t/$b/$l/$r leaves no pixels of ${w}x$h")
    val out = new Array[Byte](ow * oh)
    var y = 0
    while (y < oh) {
      System.arraycopy(px, (y + t) * w + l, out, y * ow, ow)
      y += 1
    }
    out
  }

  /** Crop an ENCODED payload by packed borders ([[packBorders]] — usually
    * the [[letterboxOf]] detection), re-encoding in the same format. The
    * exact inverse of [[padEncoded]] for every codec here: the lossless
    * formats round-trip pixels untouched, and xjpg's quantizer is a
    * projection (encode keeps the top 5 bits, decode sets the midpoint
    * bit, re-encode masks it back off), so crop(pad(x)) == x bit-for-bit. */
  def cropEncoded(bytes: Array[Byte], packed: Int): Array[Byte] = {
    if (packed == 0) return bytes
    val fmt = sniffFormat(bytes)
    val (px, w, h) = decode(bytes)
    val t = (packed >>> 24) & 0xff
    val b = (packed >>> 16) & 0xff
    val l = (packed >>> 8) & 0xff
    val r = packed & 0xff
    encode(crop(px, w, h, t, b, l, r), w - l - r, h - t - b, fmt)
  }

  /** Detected uniform letterbox borders of an ENCODED payload, packed as
    * [[packBorders]]. The border value is the top-left corner pixel (a
    * zero-width TOP border therefore reads a non-border corner and all
    * four counts collapse to 0 unless actual uniform runs exist — callers
    * that pad always pad the top by ≥1). Lossy-codec-safe: xjpg quantizes
    * per VALUE, so a uniform border stays uniform through a re-encode. */
  def letterboxOf(bytes: Array[Byte]): Int = {
    val (px, w, h) = decode(bytes)
    if (w == 0 || h == 0) return 0
    val fill = px(0)
    def rowUniform(y: Int): Boolean = {
      var x = 0
      while (x < w && px(y * w + x) == fill) x += 1
      x == w
    }
    var t = 0
    while (t < h && rowUniform(t)) t += 1
    // fully uniform: there is no content to crop TO — report no border so
    // the documented crop(detect(x)) composition stays total (a nonzero
    // top of h would make crop() compute zero output rows and throw)
    if (t == h) return 0
    var b = 0
    while (b < h - t && rowUniform(h - 1 - b)) b += 1
    def colUniform(x: Int): Boolean = {
      var y = 0
      while (y < h && px(y * w + x) == fill) y += 1
      y == h
    }
    var l = 0
    while (l < w && colUniform(l)) l += 1
    var r = 0
    while (r < w - l && colUniform(w - 1 - r)) r += 1
    packBorders(math.min(t, 255), math.min(b, 255), math.min(l, 255), math.min(r, 255))
  }

  /** PSNR (dB) between two equal-size gray8 images; Double.PositiveInfinity
    * when identical. Used by the payload-invariant tests. */
  def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length, "size mismatch")
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = ((a(i) & 0xff) - (b(i) & 0xff)).toDouble
      se += d * d
      i += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 20.0 * math.log10(255.0) - 10.0 * math.log10(se / a.length)
  }

  // little-endian helpers — the single definition all three codecs
  // (image/video/audio) share
  private[imagecodec] def putU32le(b: Array[Byte], o: Int, v: Int): Unit = putU32(b, o, v)
  private[imagecodec] def getU32le(b: Array[Byte], o: Int): Int = getU32(b, o)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }
  private def getU32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
}
