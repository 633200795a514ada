package graft.imagecodec

/** Minimal deterministic video container ("GVID") for the multimodal
  * frame-sampling plumbing: like every real container (MP4/MKV) it carries
  * a frame COUNT and a seek INDEX, so frame extraction is an O(1) offset
  * lookup + slice, never a scan-and-decode of the whole payload. Frames
  * are ordinary encoded images ([[ImageCodec]] png/bmp/xjpg), so the
  * per-frame feature kernels (dims, format, phash, resize) apply
  * unchanged to extracted frames.
  *
  * Layout (little-endian, matching the image codecs):
  * {{{
  *   0..3   magic 'G','V','I','D'
  *   4..7   u32 frame count n
  *   8..11  u32 fps (timebase for temporal sampling)
  *   12..   (n+1) u32 absolute offsets; frame i = bytes[off(i), off(i+1))
  *   ...    concatenated encoded frames
  * }}}
  *
  * Reference analog: the reference pipeline stops at single documents
  * (csinsights/data/s2processor.py one-record-at-a-time loop); the frame
  * axis is the engine's extension for video training corpora, with the
  * same opaque-binary + typed-metadata column contract as the image rows
  * (BASELINE.json input_hint).
  */
object VideoCodec {
  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  /** Assemble a GVID payload from encoded frames. */
  def mux(frames: Seq[Array[Byte]], fps: Int): Array[Byte] = {
    require(fps > 0, "fps must be positive")
    val n = frames.length
    val headerLen = 12 + 4 * (n + 1)
    val total = headerLen + frames.map(_.length).sum
    val out = new Array[Byte](total)
    System.arraycopy(Magic, 0, out, 0, 4)
    putU32(out, 4, n)
    putU32(out, 8, fps)
    var off = headerLen
    var i = 0
    while (i < n) {
      putU32(out, 12 + 4 * i, off)
      System.arraycopy(frames(i), 0, out, off, frames(i).length)
      off += frames(i).length
      i += 1
    }
    putU32(out, 12 + 4 * n, off)
    out
  }

  def isGvid(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(0) == 'G' && bytes(1) == 'V' &&
      bytes(2) == 'I' && bytes(3) == 'D'

  def frameCountOf(bytes: Array[Byte]): Int = {
    require(isGvid(bytes), "not a GVID payload")
    val n = getU32(bytes, 4)
    // a malformed header must fail HERE with a clear message, not as an
    // out-of-bounds read deep inside a codegen'd kernel; n + 1 widens to
    // Long BEFORE the add — n = Int.MaxValue must not wrap negative and
    // slip past the bound
    require(n >= 0 && bytes.length >= 12 + 4L * (n + 1L),
      s"corrupt GVID: frame count $n does not fit a ${bytes.length}-byte payload")
    n
  }

  def fpsOf(bytes: Array[Byte]): Int = {
    require(isGvid(bytes), "not a GVID payload")
    getU32(bytes, 8)
  }

  /** Extract encoded frame `i` — an index lookup + slice, no decode. */
  def frameAt(bytes: Array[Byte], i: Int): Array[Byte] = {
    val n = frameCountOf(bytes)
    require(i >= 0 && i < n, s"frame $i out of range [0, $n)")
    val start = getU32(bytes, 12 + 4 * i)
    val end = getU32(bytes, 12 + 4 * (i + 1))
    // Long arithmetic in the header-size bound, like frameCountOf
    require(start >= 12 + 4L * (n + 1L) && start <= end && end <= bytes.length,
      s"corrupt GVID: frame $i offsets [$start, $end) outside payload of ${bytes.length}")
    java.util.Arrays.copyOfRange(bytes, start, end)
  }

  private def putU32(b: Array[Byte], o: Int, v: Int): Unit = ImageCodec.putU32le(b, o, v)
  private def getU32(b: Array[Byte], o: Int): Int = ImageCodec.getU32le(b, o)
}
