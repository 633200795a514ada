package graft.imagecodec

/** Minimal deterministic audio container ("GAUD") — the audio leg of the
  * opaque-binary + typed-metadata multimodal contract ([[VideoCodec]] is
  * the video leg): a WAV-shaped header (sample rate + sample count) over
  * 16-bit little-endian PCM. Feature extraction (duration, peak,
  * energy) decodes the REAL sample stream, so a mis-sliced or
  * byte-swapped payload is caught by the closed-form oracle, exactly like
  * the image kernels' planted-metadata checks.
  *
  * Layout (little-endian):
  * {{{
  *   0..3   magic 'G','A','U','D'
  *   4..7   u32 sample rate (Hz)
  *   8..11  u32 sample count n
  *   12..   n × s16 PCM samples
  * }}}
  */
object AudioCodec {
  private val Magic = Array[Byte]('G', 'A', 'U', 'D')

  def mux(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, "sample rate must be positive")
    val out = new Array[Byte](12 + 2 * samples.length)
    System.arraycopy(Magic, 0, out, 0, 4)
    putU32(out, 4, sampleRate)
    putU32(out, 8, samples.length)
    var i = 0
    while (i < samples.length) {
      out(12 + 2 * i) = (samples(i) & 0xff).toByte
      out(13 + 2 * i) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def isGaud(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 && bytes(0) == 'G' && bytes(1) == 'A' &&
      bytes(2) == 'U' && bytes(3) == 'D'

  def sampleRateOf(bytes: Array[Byte]): Int = {
    require(isGaud(bytes), "not a GAUD payload")
    val rate = getU32(bytes, 4)
    require(rate > 0, s"corrupt GAUD: sample rate $rate")
    rate
  }

  def numSamplesOf(bytes: Array[Byte]): Int = {
    require(isGaud(bytes), "not a GAUD payload")
    val n = getU32(bytes, 8)
    // reject negative (high-bit) counts and counts past the payload here,
    // with a clear message, instead of an out-of-bounds read in the fold
    require(n >= 0 && bytes.length >= 12 + 2L * n,
      s"corrupt GAUD: sample count $n does not fit a ${bytes.length}-byte payload")
    n
  }

  def samplesOf(bytes: Array[Byte]): Array[Short] = {
    val n = numSamplesOf(bytes)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(12 + 2 * i) & 0xff) | (bytes(13 + 2 * i) << 8)).toShort
      i += 1
    }
    out
  }

  /** `[sample_rate, n_samples, duration_ms, peak_abs, sum_sq]` — one fold
    * over the PCM stream; all integer-exact so the feature set is
    * engine-portable (duration is floor(n·1000/rate)). */
  def statsOf(bytes: Array[Byte]): Array[Long] = {
    val rate = sampleRateOf(bytes).toLong
    val n = numSamplesOf(bytes)
    var peak = 0L
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(12 + 2 * i) & 0xff) | (bytes(13 + 2 * i) << 8)).toShort.toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s * s
      i += 1
    }
    Array(rate, n.toLong, n.toLong * 1000L / rate, peak, sumSq)
  }

  private def putU32(b: Array[Byte], o: Int, v: Int): Unit = ImageCodec.putU32le(b, o, v)
  private def getU32(b: Array[Byte], o: Int): Int = ImageCodec.getU32le(b, o)
}
