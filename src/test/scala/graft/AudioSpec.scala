package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.imagecodec.AudioCodec
import graft.model.Synth

class AudioSpec extends SparkSpec {

  test("GAUD mux/samplesOf round-trips PCM bit-exactly; stats fold the real stream") {
    (0L until 40L).foreach { i =>
      val doc = Synth.makeAudioDoc(i)
      assert(AudioCodec.sampleRateOf(doc.bytes) == doc.sample_rate)
      assert(AudioCodec.numSamplesOf(doc.bytes) == doc.n_samples)
      val samples = AudioCodec.samplesOf(doc.bytes)
      assert(samples.length == doc.n_samples)
      // negative samples must survive the s16 round trip (sign extension)
      assert(samples.exists(_ < 0), s"audio $i has no negative samples")
      val expectedPeak = samples.map(s => math.abs(s.toLong)).max
      val expectedSumSq = samples.map(s => s.toLong * s.toLong).sum
      val st = AudioCodec.statsOf(doc.bytes)
      assert(st.sameElements(Array(doc.sample_rate.toLong, doc.n_samples.toLong,
        doc.n_samples.toLong * 1000L / doc.sample_rate, expectedPeak, expectedSumSq)))
      // the planted closed forms the m8 oracle uses
      assert(st(3) == Synth.audioAmpOf(i).toLong)
      assert(st(4) == doc.n_samples.toLong * Synth.audioAmpOf(i).toLong * Synth.audioAmpOf(i))
    }
  }

  test("corrupt GAUD payloads fail fast with a clear message, not a div-by-zero or OOB read") {
    val good = Synth.makeAudioDoc(1L).bytes
    val zeroRate = good.clone()
    zeroRate(4) = 0; zeroRate(5) = 0; zeroRate(6) = 0; zeroRate(7) = 0
    assert(intercept[IllegalArgumentException](
      AudioCodec.statsOf(zeroRate)).getMessage.contains("corrupt GAUD"))
    val truncated = java.util.Arrays.copyOf(good, 20)
    assert(intercept[IllegalArgumentException](
      AudioCodec.statsOf(truncated)).getMessage.contains("corrupt GAUD"))
    val negCount = good.clone()
    negCount(11) = 0x80.toByte
    assert(intercept[IllegalArgumentException](
      AudioCodec.statsOf(negCount)).getMessage.contains("corrupt GAUD"))
  }

  test("audio_stats kernel over a frame: matches closed forms, shuffle-free plan") {
    val g = graft.functions.graftfns
    val out = Synth.audioDocs(spark, 50, 4).toDF()
      .select(substring(col("audio_id"), 4, 8).cast("long").as("id"),
        g.audioStats(col("bytes")).as("st"))
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"audio feature extraction must not shuffle:\n$plan")
    out.collect().foreach { r =>
      val i = r.getLong(0)
      val st = r.getSeq[Long](1)
      val amp = Synth.audioAmpOf(i).toLong
      val n = Synth.audioNumSamplesOf(i).toLong
      assert(st == Seq(Synth.audioSampleRateOf(i).toLong, n,
        n * 1000L / Synth.audioSampleRateOf(i), amp, n * amp * amp), s"audio $i")
    }
  }
}
