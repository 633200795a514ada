package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.imagecodec.{ImageCodec, VideoCodec}
import graft.model.Synth
import graft.ops.VideoOps

class VideoSpec extends SparkSpec {

  test("GVID mux/frameAt round-trips every frame bit-exactly") {
    (0L until 40L).foreach { i =>
      val doc = Synth.makeVideoDoc(i)
      assert(VideoCodec.frameCountOf(doc.bytes) == doc.nframes)
      assert(VideoCodec.fpsOf(doc.bytes) == doc.fps)
      (0 until doc.nframes).foreach { f =>
        val frame = VideoCodec.frameAt(doc.bytes, f)
        val w = Synth.videoFrameWOf(i, f); val h = Synth.videoFrameHOf(i, f)
        val expected = ImageCodec.encode(
          ImageCodec.syntheticPixels(Synth.videoPixelSeedOf(i, f), w, h),
          w, h, Synth.videoFrameFmtOf(i, f))
        assert(java.util.Arrays.equals(frame, expected), s"video $i frame $f")
        assert(ImageCodec.decodeDims(frame) == ((w, h)))
      }
      intercept[IllegalArgumentException](VideoCodec.frameAt(doc.bytes, doc.nframes))
      intercept[IllegalArgumentException](VideoCodec.frameAt(doc.bytes, -1))
    }
  }

  test("corrupt GVID payloads fail fast with a clear message, not an out-of-bounds read") {
    val good = Synth.makeVideoDoc(1L).bytes
    // truncated mid-index: frame count no longer fits
    val truncated = java.util.Arrays.copyOf(good, 14)
    assert(intercept[IllegalArgumentException](
      VideoCodec.frameCountOf(truncated)).getMessage.contains("corrupt GVID"))
    // first frame offset pointing past the payload
    val badOffset = good.clone()
    badOffset(12) = 0xff.toByte; badOffset(13) = 0xff.toByte
    badOffset(14) = 0xff.toByte; badOffset(15) = 0x7f.toByte
    assert(intercept[IllegalArgumentException](
      VideoCodec.frameAt(badOffset, 0)).getMessage.contains("corrupt GVID"))
    // negative (high-bit) frame count
    val badCount = good.clone()
    badCount(7) = 0x80.toByte
    assert(intercept[IllegalArgumentException](
      VideoCodec.frameCountOf(badCount)).getMessage.contains("corrupt GVID"))
  }

  test("sampleFrames: uniform policy — first frame kept, strictly increasing, short clips complete") {
    val df = VideoOps.sampleFrames(Synth.videoDocs(spark, 60, 4).toDF(), "bytes", 4)
      .select(col("video_id"), col("nframes"), col("t"), col("frame_idx"))
      .collect()
      .groupBy(_.getString(0))
    df.foreach { case (vid, rows) =>
      val byT = rows.sortBy(_.getLong(2))
      val n = byT.head.getInt(1)
      val idxs = byT.map(_.getLong(3))
      assert(idxs.head == 0L, s"$vid must sample frame 0")
      assert(idxs.length == math.min(4, n), s"$vid sampled ${idxs.length} of n=$n")
      assert(idxs.zip(idxs.tail).forall { case (a, b) => a < b }, s"$vid not increasing")
      assert(idxs.forall(_ < n), s"$vid index out of clip range")
      if (n <= 4) assert(idxs.sameElements(0L until n), s"$vid short clip must keep all")
    }
    assert(df.size == 60)
  }

  test("fingerprintDups recovers exactly the planted re-posts (container bytes differ, frames agree)") {
    import spark.implicits._
    val n = 120L
    val vids = Synth.videoDocs(spark, n, 4).toDF()
      .select(substring(col("video_id"), 4, 8).cast("long").as("id"), col("bytes"))
    val pairs = VideoOps.fingerprintDups(vids, "id", "bytes", 4)
      .as[(Long, Long)].collect().toSet
    val planted = (0L until n).filter(i => Synth.videoDupSourceOf(i) != i)
      .map(i => (i - 20, i)).toSet
    assert(pairs == planted, s"got $pairs, wanted $planted")
    // the plant is invisible to byte-level dedup: container bytes differ
    planted.foreach { case (a, b) =>
      assert(!java.util.Arrays.equals(Synth.makeVideoDoc(a).bytes, Synth.makeVideoDoc(b).bytes))
    }
  }

  test("sampleFrames: an empty clip contributes no frames (no descending-sequence rows)") {
    import spark.implicits._
    val empty = graft.model.VideoDoc("vid_empty", VideoCodec.mux(Seq.empty, 10), 0, 10)
    val one = Synth.makeVideoDoc(7L)
    val out = VideoOps.sampleFrames(Seq(empty, one).toDS().toDF(), "bytes", 4).collect()
    assert(out.forall(_.getAs[String]("video_id") != "vid_empty"))
    assert(out.length == math.min(4, one.nframes))
  }

  test("sampleFrames + per-frame decode matches the planted metadata, shuffle-free plan") {
    val g = graft.functions.graftfns
    val out = VideoOps.sampleFrames(
        Synth.videoDocs(spark, 50, 4).toDF().select(
          substring(col("video_id"), 4, 8).cast("long").as("id"), col("bytes")),
        "bytes", 4)
      .select(col("id"), col("frame_idx"),
        g.decodeWidth(col("frame")).as("w"), g.decodeHeight(col("frame")).as("h"),
        g.sniffFormat(col("frame")).as("fmt"))
    val plan = out.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"frame sampling must not shuffle:\n$plan")
    out.collect().foreach { r =>
      val i = r.getLong(0); val f = r.getLong(1).toInt
      assert(r.getInt(2) == Synth.videoFrameWOf(i, f))
      assert(r.getInt(3) == Synth.videoFrameHOf(i, f))
      assert(r.getString(4) == Synth.videoFrameFmtOf(i, f))
    }
  }
}
