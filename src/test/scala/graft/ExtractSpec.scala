package graft

import org.apache.spark.sql.functions._

import graft.extract.Extract
import graft.functions.graftfns
import graft.model.Synth
import graft.pipeline.CrawlPipeline
import graft.seen.BloomSeen

/** Payload-invariant + expression tests (BASELINE.json input_hint:
  * decoded-pixel PSNR≥40dB for lossy formats, bit-exact captions). */
class ExtractSpec extends SparkSpec {

  private val N = 500L
  private lazy val docs = Synth.imageDocs(spark, N, 4)

  test("custom expressions run inside codegen: phash/dims/format match the store columns") {
    val meta = Extract.metadata(docs.toDF())
    val bad = meta.filter(
      col("dec_fmt") =!= col("fmt") ||
      col("dec_w") =!= col("w") ||
      col("dec_h") =!= col("h")).count()
    assert(bad == 0)
    // phash: exact for lossless decode; xjpg decodes quantized pixels, so
    // the perceptual hash may drift a few bits — bound the hamming distance
    val exactBad = meta.filter(col("fmt") =!= "xjpg" && col("dec_phash") =!= col("phash")).count()
    assert(exactBad == 0)
    val lossyFar = meta.filter(col("fmt") === "xjpg")
      .filter(bit_count(col("dec_phash").bitwiseXOR(col("phash"))) > 8).count()
    assert(lossyFar == 0)
  }

  test("payload invariant: PSNR >= 40dB for lossy fmt, +inf (bit-exact) for lossless") {
    // re-encode pixels losslessly as reference, compare via psnr expression
    import spark.implicits._
    val ref = docs.map { d =>
      val (px, w, h) = graft.imagecodec.ImageCodec.decode(d.bytes)
      (d.image_id, graft.imagecodec.ImageCodec.encodePng(
        graft.imagecodec.ImageCodec.syntheticPixels(Synth.pixelSeedOf(d.image_id.drop(3).toLong), w, h), w, h))
    }.toDF("image_id", "ref_bytes")
    val joined = docs.toDF().join(ref, "image_id")
      .withColumn("p", graftfns.psnr(col("bytes"), col("ref_bytes")))
    val lossyBad = joined.filter(col("fmt") === "xjpg" && col("p") < 40.0).count()
    val losslessBad = joined.filter(col("fmt") =!= "xjpg" && !col("p").isNull && col("p") =!= Double.PositiveInfinity).count()
    assert(lossyBad == 0, "lossy rows under 40dB")
    assert(losslessBad == 0, "lossless rows not bit-exact")
  }

  test("phash near-dup pairs recover lossy re-encodes via banded hamming join") {
    import spark.implicits._
    // plant near-dups: lossy xjpg re-encodes of the first 20 images — same
    // pixels through the quantizer, phash drifts ≤8 bits (bound asserted in
    // the codegen test above)
    val clones = docs.filter(_.image_id.drop(3).toLong < 20).map { d =>
      val (px, w, h) = graft.imagecodec.ImageCodec.decode(d.bytes)
      d.copy(image_id = "img" + (d.image_id.drop(3).toLong + 100000),
        bytes = graft.imagecodec.ImageCodec.encodeXjpg(px, w, h), fmt = "xjpg")
    }
    val meta = Extract.metadata(docs.union(clones).toDF())
    // maxHamming(8) < numBands(16) ⇒ pigeonhole-complete hamming ball
    val pairs = Extract.phashNearDupPairs(meta, maxHamming = 8, numBands = 16)
      .collect().map(r => (r.getAs[String]("id_a"), r.getAs[String]("id_b"))).toSet
    (0 until 20).foreach { i =>
      val (a, b) = (f"img$i%08d", s"img${i + 100000}")
      assert(pairs.contains((a, b)) || pairs.contains((b, a)),
        s"planted lossy near-dup $a/$b not recovered")
    }
  }

  test("captions survive the fetch pipeline bit-exactly") {
    import spark.implicits._
    val cfg = CrawlPipeline.Config(nUrls = N, budget = 4, numPartitions = 4, bloomBuckets = 4)
    val fetched = CrawlPipeline.runAll(spark, cfg, docs.toDF())
    val mismatches = fetched.filter(col("status") === 200).map { r =>
      val id = r.getAs[String]("image_id").drop(3).toLong
      val expected = Synth.captionOf(id)
      if (r.getAs[String]("caption") == expected) 0 else 1
    }.reduce(_ + _)
    assert(mismatches == 0)
  }

  test("phash dedup finds the injected ~2% duplicate pixel groups") {
    val meta = Extract.metadata(docs.toDF())
    val groups = Extract.phashDupGroups(meta.withColumnRenamed("image_id", "image_id"))
    assert(groups.count() > 0)
  }

  test("decodeStats mapPartitions path agrees with expression path") {
    val stats = Extract.decodeStats(docs).toDF()
      .select(col("image_id"), col("phash").as("stats_phash"))
    val bad = stats.join(docs.toDF().select("image_id", "phash", "fmt"), "image_id")
      .filter(col("fmt") =!= "xjpg") // lossless decode must agree exactly
      .filter(col("stats_phash") =!= col("phash")).count()
    assert(bad == 0)
  }

  test("resize_nn: dims change, format preserved, deterministic, downsample-of-self phash-stable") {
    import graft.imagecodec.ImageCodec
    val meta = docs.toDF()
      .withColumn("small", graftfns.resizeNN(col("bytes"), lit(8), lit(8)))
      .withColumn("small_w", graftfns.decodeWidth(col("small")))
      .withColumn("small_h", graftfns.decodeHeight(col("small")))
      .withColumn("small_fmt", graftfns.sniffFormat(col("small")))
    assert(meta.filter(col("small_w") =!= 8 || col("small_h") =!= 8).count() == 0)
    assert(meta.filter(col("small_fmt") =!= col("fmt")).count() == 0)
    // determinism: two independent evaluations agree bit-for-bit
    val again = docs.toDF().withColumn("small2", graftfns.resizeNN(col("bytes"), lit(8), lit(8)))
      .select("image_id", "small2")
    val joined = meta.select("image_id", "small").join(again, "image_id")
    assert(joined.filter(col("small") =!= col("small2")).count() == 0)
    // pure-Scala twin agrees with the expression
    val row = meta.filter(col("image_id") === "img00000001").select("bytes", "small").head()
    val expect = ImageCodec.resizeEncoded(row.getAs[Array[Byte]]("bytes"), 8, 8)
    assert(java.util.Arrays.equals(row.getAs[Array[Byte]]("small"), expect))
  }

  test("md5 integrity split quarantines corrupted payloads without failing the job") {
    import spark.implicits._
    val cfg = CrawlPipeline.Config(nUrls = 100L, budget = 4, numPartitions = 4, bloomBuckets = 4)
    val fetched = CrawlPipeline.runAll(spark, cfg, docs.toDF()).filter(col("status") === 200)
    // expected digests: correct except every 5th image corrupted on purpose
    val expected = docs.map { d =>
      val md5 = java.security.MessageDigest.getInstance("MD5").digest(d.bytes)
        .map("%02x".format(_)).mkString
      val idx = d.image_id.stripPrefix("img").toLong
      (d.image_id, if (idx % 5 == 0) "0" * 32 else md5)
    }.toDF("image_id", "expected_md5")
    val (ok, quarantined) = graft.fetch.Fetch.integritySplit(fetched, expected)
    val nOk = ok.count(); val nQ = quarantined.count()
    assert(nQ > 0, "corrupted rows must be quarantined")
    assert(nOk + nQ == fetched.count())
    assert(quarantined.filter(!col("image_id").substr(4, 8).cast("long").mod(5).equalTo(0)).count() == 0)
  }

  test("bloom DF gate passes no seen urls and nearly all unseen (fp-bounded)") {
    import spark.implicits._
    val all = CrawlPipeline.planAll(spark, CrawlPipeline.Config(nUrls = N, numPartitions = 4))
      .select("canonical_url")
    val seen = all.filter(xxhash64(col("canonical_url")) % 2 === 0)
    val shards = BloomSeen.buildShards(seen, numBuckets = 4)
    val passed = BloomSeen.gateNotSeen(all, shards, numBuckets = 4)
    // no false negatives: nothing in `seen` survives the gate
    assert(passed.join(seen, Seq("canonical_url"), "left_semi").count() == 0)
    // false positives bounded: survivors ≈ |unseen|
    val unseen = all.join(seen, Seq("canonical_url"), "left_anti").count()
    val got = passed.count()
    assert(got >= unseen * 95 / 100, s"too many fp: $got of $unseen")
    // the partitioned (non-broadcast, 10^10-regime) gate is row-equal to
    // the broadcast-probe gate — same shards, co-partitioned join path
    val passedPart = BloomSeen.gateNotSeenPartitioned(all, shards, numBuckets = 4)
    assert(passedPart.select("canonical_url").collect().map(_.getString(0)).toSet ==
      passed.select("canonical_url").collect().map(_.getString(0)).toSet,
      "partitioned gate diverges from broadcast gate")
  }
}
