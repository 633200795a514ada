package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.imagecodec.{AudioCodec, ImageCodec, VideoCodec}

/** Deterministic synthetic data for the crawl engine (FIXTURES.md §1-4).
  * Seeded, no wall clock, no external data — every run is bit-reproducible.
  * Generation happens ON THE EXECUTORS via `spark.range` so it scales to
  * arbitrary row counts without driver materialization.
  */
object Synth {
  val Seed = 42L
  val NumHosts = 50

  private val fmts = Array("png", "bmp", "xjpg")
  private val dims = Array(8, 16, 32, 64)
  private val vocab: Array[String] =
    "the quick brown fox lazy dog spark crawl frontier fetch image caption host url seen batch snapshot lineage shuffle partition".split(" ")

  def imageIdOf(i: Long): String = f"img$i%08d"
  def fmtOf(i: Long): String = fmts((i % 3).toInt)

  /** ~2% duplicate pixel patterns to exercise phash dedup (FIXTURES.md §1):
    * every 50th row reuses the pattern AND dims of the row 25 before it
    * (same pixels, possibly different encoding fmt → cross-format dups). */
  def dupSourceOf(i: Long): Long = if (i % 50 == 49 && i >= 25) i - 25 else i

  def wOf(i: Long): Int = dims((dupSourceOf(i) % 4).toInt)
  def hOf(i: Long): Int = dims(((dupSourceOf(i) + 1) % 4).toInt)

  def pixelSeedOf(i: Long): Long = ImageCodec.mix64(Seed ^ dupSourceOf(i))

  def captionOf(i: Long): String = {
    if (i % 97 == 0) "" // ~1% empty
    else {
      val n = 4 + (ImageCodec.mix64(Seed ^ ~i) & 7).toInt
      val sb = new StringBuilder
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(if (i % 101 == 0 && k == 1) "\t" else " ") // ~1% tabs
        sb.append(vocab((ImageCodec.mix64(Seed ^ i ^ k.toLong) % vocab.length).toInt.abs))
        k += 1
      }
      sb.toString
    }
  }

  def makeImageDoc(i: Long): ImageDoc = {
    val w = wOf(i); val h = hOf(i); val fmt = fmtOf(i)
    val px = ImageCodec.syntheticPixels(pixelSeedOf(i), w, h)
    val bytes = ImageCodec.encode(px, w, h, fmt)
    ImageDoc(imageIdOf(i), bytes, w, h, fmt, captionOf(i),
      ImageCodec.averageHash(px, w, h))
  }

  /** Zipf-skewed host assignment — host 0 is hot (FIXTURES.md §2), which
    * exercises AQE skew handling and the salted partitioner.
    * CDF precomputed once + binary search: this runs per frontier url, and
    * the original per-call harmonic loop was the top CPU consumer of the
    * whole 2M-url bench. Host strings are interned in a lookup table. */
  private lazy val zipfCdf: Array[Double] = {
    val hN = (1 to NumHosts).map(1.0 / _).sum
    val cdf = new Array[Double](NumHosts)
    var acc = 0.0
    var h = 1
    while (h <= NumHosts) { acc += 1.0 / (h * hN); cdf(h - 1) = acc; h += 1 }
    cdf
  }
  private lazy val hostNames: Array[String] =
    (0 until NumHosts).map(h => s"h$h.example.com").toArray

  def hostOf(i: Long): String = {
    val z = ImageCodec.mix64(Seed ^ (i * 31)) >>> 1
    val u = (z % 1000000L).toDouble / 1000000.0
    // first index with cdf >= u — identical result to the original linear
    // scan (which advanced while acc + p(h) < u)
    var lo = 0; var hi = NumHosts - 1
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (zipfCdf(mid) < u) lo = mid + 1 else hi = mid
    }
    hostNames(lo)
  }

  def urlOf(i: Long): String = s"https://${hostOf(i)}/img/${imageIdOf(i)}.${fmtOf(i)}"

  /** Seed url for rank i — every 10th seed re-emits the url 5 back (with
    * mixed-case host + fragment noise on some), so frontier dedup and
    * canonicalization are genuinely exercised. */
  def seedUrlOf(i: Long): String = {
    val base = if (i % 10 == 9 && i >= 5) urlOf(i - 5) else urlOf(i)
    if (i % 13 == 0) base.replace("https://h", "https://H") + "#frag"
    else if (i % 17 == 0) base.replace(".example.com/", ".example.com:443/")
    else base
  }

  def priorityOf(i: Long): Long = (ImageCodec.mix64(Seed ^ i ^ 0x5eedL) >>> 1) % 100

  /** The primary input table (BASELINE.json input_hint). */
  def imageDocs(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[ImageDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(r => makeImageDoc(r))
  }

  /** ~2.5% same-content video re-posts (the d21 plant, mirroring the
    * image table's [[dupSourceOf]]): every 40th video re-muxes the FRAMES
    * of the video 20 before it in a different container fps — the payload
    * bytes differ (the fps header word), so byte-level exact dedup misses
    * the pair, while frame-fingerprint dedup must recover it. */
  def videoDupSourceOf(i: Long): Long = if (i % 40 == 39 && i >= 20) i - 20 else i

  /** Frame metadata closed forms for video `i` — the m7/d21 oracles
    * re-derive these in SQL, so they must stay integer-only arithmetic
    * (all through the dup-source indirection: a re-post carries its
    * source's frames). */
  def videoFrameCountOf(i: Long): Int = 3 + (videoDupSourceOf(i) % 6).toInt
  def videoFrameFmtOf(i: Long, f: Int): String = fmts(((videoDupSourceOf(i) + f) % 3).toInt)
  def videoFrameWOf(i: Long, f: Int): Int = dims(((videoDupSourceOf(i) + 2L * f) % 4).toInt)
  def videoFrameHOf(i: Long, f: Int): Int = dims(((videoDupSourceOf(i) + f + 1L) % 4).toInt)
  def videoPixelSeedOf(i: Long, f: Int): Long =
    ImageCodec.mix64(Seed ^ (videoDupSourceOf(i) * 131 + f))
  def videoFpsOf(i: Long): Int = if (videoDupSourceOf(i) == i) 10 else 25

  def makeVideoDoc(i: Long): VideoDoc = {
    val n = videoFrameCountOf(i)
    val frames = (0 until n).map { f =>
      val w = videoFrameWOf(i, f); val h = videoFrameHOf(i, f)
      val px = ImageCodec.syntheticPixels(videoPixelSeedOf(i, f), w, h)
      ImageCodec.encode(px, w, h, videoFrameFmtOf(i, f))
    }
    VideoDoc(s"vid${imageIdOf(i).drop(3)}", VideoCodec.mux(frames, videoFpsOf(i)),
      n, videoFpsOf(i))
  }

  /** Video rows for the frame-sampling plumbing (m7): GVID payloads whose
    * per-frame dims/format follow the closed forms above. */
  def videoDocs(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[VideoDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => makeVideoDoc(i))
  }

  /** Audio closed forms for row `i` (the m8 oracle re-derives these):
    * the waveform is a ±amp square wave, so peak = amp and
    * sum_sq = n·amp² exactly; the half-period varies per row to exercise
    * real PCM decoding without entering the closed forms. */
  def audioSampleRateOf(i: Long): Int = Array(8000, 16000, 44100, 48000)((i % 4).toInt)
  def audioNumSamplesOf(i: Long): Int = 256 + (i % 7).toInt * 64
  def audioAmpOf(i: Long): Int = 100 + (i % 50).toInt * 10

  def makeAudioDoc(i: Long): AudioDoc = {
    val n = audioNumSamplesOf(i); val amp = audioAmpOf(i)
    val halfPeriod = 2 + (i % 3).toInt
    val samples = Array.tabulate(n) { j =>
      (if ((j / halfPeriod) % 2 == 0) amp else -amp).toShort
    }
    AudioDoc(s"aud${imageIdOf(i).drop(3)}",
      AudioCodec.mux(samples, audioSampleRateOf(i)), audioSampleRateOf(i), n)
  }

  /** Audio rows for the feature-extraction plumbing (m8). */
  def audioDocs(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[AudioDoc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => makeAudioDoc(i))
  }

  /** Crawl seed list: url + seed_rank (= the reference's sequential fetch
    * index, csinsights/client/s2client.py:146-157) + derived priority. */
  def seedList(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[SeedRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => SeedRow(seedUrlOf(i), i, priorityOf(i)))
  }

  def robotsRules(spark: SparkSession): Dataset[RobotsRule] = {
    import spark.implicits._
    (0 until NumHosts).map { h =>
      // ~10% of hosts disallow their whole /img/ tree (FIXTURES.md §3) —
      // the gate must actually drop their urls (tested vs ReferenceSim).
      if (h % 10 == 3) RobotsRule(s"h$h.example.com", "/img/", allowed = false)
      else RobotsRule(s"h$h.example.com", "", allowed = true)
    }.toDS()
  }

  def hostBudgets(spark: SparkSession, budget: Int): Dataset[HostBudget] = {
    import spark.implicits._
    (0 until NumHosts).map(h => HostBudget(s"h$h.example.com", budget)).toDS()
  }
}

final case class SeedRow(url: String, seed_rank: Long, priority: Long)
