package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.graftfns

/** Video frame sampling — the multimodal plumbing for video training
  * corpora (builder prompt: decode / feature-extract / resize /
  * frame-sample; the image legs are m1–m5, this is the frame axis).
  *
  * Policy: uniform temporal sampling, the standard video-model recipe —
  * take m = min(k, n) frames at indices floor(t·n/m), t ∈ [0, m): the
  * first frame is always index 0, indices are strictly increasing, and
  * short clips (n ≤ k) contribute every frame. Integer-only arithmetic so
  * the index choice is engine-portable (the m7 oracle re-derives it in
  * SQL).
  *
  * Scale shape: entirely row-local — header read (frame_count), a lazily
  * generated index array, and per-index O(1) seek-slice extraction
  * ([[graft.imagecodec.VideoCodec.frameAt]]); the plan is scan → generate
  * → project with NO exchange, so it rides whatever partitioning the
  * video table already has and video bytes are never shuffled (same
  * bytes-stay-put contract as the bucketed image store). Output size is
  * bounded by k×(per-frame bytes), not by clip length — a long clip costs
  * the same downstream as a short one. */
object VideoOps {

  /** Explode `bytesCol` GVID payloads into ≤ k uniformly-sampled frames.
    * Keeps every input column and adds: `n` (clip frame count), `t`
    * (sample ordinal), `frame_idx` (chosen frame), `frame` (the encoded
    * frame, an ordinary image payload for the per-frame kernels) — those
    * four names are reserved: an input already using one would be
    * silently clobbered, so it is rejected instead. */
  def sampleFrames(videos: DataFrame, bytesCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val reserved = Seq("n", "t", "frame_idx", "frame", "__m")
    val clash = videos.columns.toSeq.intersect(reserved)
    require(clash.isEmpty,
      s"sampleFrames adds columns ${reserved.mkString(", ")}; input already has ${clash.mkString(", ")}")
    val keep = videos.columns.map(col)
    videos
      .withColumn("n", graftfns.frameCount(col(bytesCol)))
      .withColumn("__m", least(col("n"), lit(k)).cast("long"))
      // an empty clip contributes no frames — without this guard Spark's
      // sequence(0, m-1) would DESCEND for m = 0 and emit two bogus rows
      .filter(col("__m") > 0L)
      .select(keep ++ Seq(col("n"), col("__m"),
        explode(sequence(lit(0L), col("__m") - 1L)).as("t")): _*)
      .withColumn("frame_idx", expr("(t * cast(n as bigint)) div __m"))
      .withColumn("frame", graftfns.frameAt(col(bytesCol), col("frame_idx").cast("int")))
      .drop("__m")
  }

  /** Video near-dup pairs by sampled-frame phash fingerprint — the video
    * leg of the dedup family (exact: Dedup.exact; image: d10/d18;
    * caption/cross-modal: d12): two clips match when EVERY sampled frame's
    * perceptual hash agrees, which catches same-content re-posts whose
    * container bytes differ (re-mux, fps change — the byte-level md5 gate
    * misses those) while the k×64-bit fingerprint keeps accidental
    * collisions out of reach. Emits `(id_a, id_b)` star pairs, min id
    * first, exactly like the other dedup legs feed
    * [[Dedup.connectedComponents]].
    *
    * Scale shape: frame extraction + phash are row-local (sampleFrames);
    * only `(fingerprint, id)` rows — k longs + an id — reach the ONE
    * groupBy exchange, never clip bytes; star pairs are O(dup rows) per
    * group (min-id anchor, no within-group quadratic join). */
  def fingerprintDups(videos: DataFrame, idCol: String, bytesCol: String,
      k: Int): DataFrame = {
    // the clip frame count n joins the group key: two clips that happen to
    // share their k SAMPLED frames but differ in length (one clip built
    // from exactly the other's sampled frames) are not the same content
    val fp = sampleFrames(videos.select(col(idCol), col(bytesCol)), bytesCol, k)
      .select(col(idCol), col("n"), col("t"), graftfns.phash(col("frame")).as("ph"))
      .groupBy(idCol)
      .agg(first(col("n")).as("n"),
        transform(array_sort(collect_list(struct(col("t"), col("ph")))),
          x => x.getField("ph")).as("fp"))
    fp.groupBy("n", "fp")
      .agg(min(col(idCol)).as("id_a"), collect_list(col(idCol)).as("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_b") > col("id_a"))
  }
}
