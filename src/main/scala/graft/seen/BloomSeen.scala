package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.UrlCanon

/** One serialized Bloom shard per salted bucket. */
final case class BloomShard(bucket: Int, blob: Array[Byte], n_items: Long)

/** Partitioned Bloom URL-seen set (north_rule: "partitioned Bloom/cuckoo
  * URL-seen set, salted-hash partitioned to kill host-key skew at
  * 10^10-URL scale").
  *
  * Scale reasoning: at 10^10 urls and fpp 1e-3, a monolithic filter is
  * ~17 GB — too big to broadcast. Sharding by `pmod(xxhash64(url, salt),
  * B)` gives B independent ~(17/B) GB filters; the salt makes bucket load
  * uniform regardless of host skew, and the gate co-partitions candidates
  * with their shard (one shuffle on the already-needed bucket key), so no
  * executor ever holds more than ~2 shards. In-sandbox B=32; at 10^10 set
  * B so each shard is ~256 MB.
  *
  * The exact path ([[ExactSeen]]) is kept separate for the equality check
  * vs reference (BASELINE.md "URL-seen membership: exact").
  */
object BloomSeen {
  val DefaultSalt = 0x5a17edb10c3e7L

  def bucketCol(canonicalUrl: org.apache.spark.sql.Column, numBuckets: Int, salt: Long) =
    UrlCanon.saltedBucket(canonicalUrl, salt, numBuckets).cast("int")

  /** Build shards via a typed [[BloomAggregator]]: partial bloom buffers
    * are built map-side per input partition, so the one shuffle moves only
    * (numBuckets × inputPartitions) fixed-size bit arrays — never the
    * 10^10 keys themselves. The driver never sees a url.
    *
    * `expectedPerShard` sizes every shard identically (required for
    * OR-mergeability); default assumes the caller bucketed so that each
    * shard holds ~seen/numBuckets keys. Pass the real per-shard
    * cardinality at production scale.
    */
  def buildShards(
      seen: DataFrame, // col: canonical_url
      numBuckets: Int,
      fpp: Double = 1e-4,
      salt: Long = DefaultSalt,
      expectedPerShard: Long = 0L): Dataset[BloomShard] = {
    val spark = seen.sparkSession
    import spark.implicits._
    val expect =
      if (expectedPerShard > 0) expectedPerShard
      else math.max(seen.count() / numBuckets + 1, 1024L) // one cheap count job
    val keyed = seen
      .select(
        bucketCol(col("canonical_url"), numBuckets, salt).as("bucket"),
        UrlCanon.saltedKey(col("canonical_url"), salt).as("key"))
      .as[(Int, Long)]
    val agg = new BloomAggregator(expect, fpp).toColumn
    keyed.groupByKey(_._1).mapValues(_._2)
      .agg(agg)
      .map { case (bucket, (blob, n)) => BloomShard(bucket, blob, n) }
  }

  /** Filter `candidates` (must carry canonical_url) down to rows the Bloom
    * set does NOT contain (the no-false-negative fast path of the
    * frontier-minus-seen anti join).
    *
    * Default path: collect the shards (small: numBuckets × shard bytes),
    * broadcast them once, and probe via [[graft.functions.BloomProbeExpr]]
    * inside codegen — NO join. Joining the blob in as a column re-copies
    * the whole shard out of the UnsafeRow for every candidate row
    * (measured ~6.7s of memcpy on a 2M-row gate).
    *
    * When total shard bytes exceed `broadcastLimit` (10^10-url regime —
    * e.g. 1024 shards × 256 MB), use [[gateNotSeenPartitioned]]: candidates
    * co-partition with shards on the salted bucket and each task streams
    * one shard. */
  def gateNotSeen(
      candidates: DataFrame,
      shards: Dataset[BloomShard],
      numBuckets: Int,
      salt: Long = DefaultSalt): DataFrame = {
    import graft.functions.{BloomProbeExpr, BloomShardMap}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    val shardMap = new BloomShardMap(
      shards.collect().map(s => s.bucket -> s.blob).toMap)
    val bc = spark.sparkContext.broadcast(shardMap)
    val probe = Bridge.column(BloomProbeExpr(
      Bridge.expression(bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    candidates.filter(!probe)
  }

  /** Exact frontier-minus-seen with a Bloom fast path — the CORRECT
    * composition (gateNotSeen alone drops bloom false-positive UNSEEN
    * urls, ~fpp of the frontier):
    *
    *   bloom-negative  → definitely unseen → pass (no join work);
    *   bloom-positive  → exact anti-join vs `seen` confirms.
    *
    * The exact join's input shrinks from |candidates| to
    * |candidates ∩ seen| + fp. Both probe branches filter the SAME child
    * subtree, so the upstream shuffle is computed once (AQE stage reuse).
    * Result is row-for-row equal to a plain exact anti join (asserted in
    * CrawlOrderSpec).
    *
    * Cache lifecycle: both inputs are persisted (multi-consumer plans) and
    * stay cached after return because the result is LAZY — callers own the
    * release (unpersist / `cacheManager.clearCache()` after consuming) in
    * long-lived sessions; see [[graft.seen.CuckooSeen]]. */
  def notSeenExactWithBloomFastPath(
      candidates: DataFrame,
      seen: DataFrame,
      numBuckets: Int,
      fpp: Double = 1e-4,
      salt: Long = DefaultSalt,
      expectedPerShard: Long = 0L): DataFrame = {
    import graft.functions.{BloomProbeExpr, BloomShardMap}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    // seen is consumed up to three times (sizing count, shard build, exact
    // confirm) — persist so the derivation pipeline runs once
    val seenP = seen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shards = buildShards(seenP, numBuckets, fpp, salt, expectedPerShard)
    val shardMap = new BloomShardMap(shards.collect().map(s => s.bucket -> s.blob).toMap)
    val bc = spark.sparkContext.broadcast(shardMap)
    val probe = Bridge.column(BloomProbeExpr(
      Bridge.expression(bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    // Persist before branching: Catalyst pushes the deterministic probe
    // filter BELOW the upstream exchanges, which de-duplicates nothing —
    // the two branches would each recompute the full candidate pipeline
    // (measured ~2x the whole job's CPU). The cache is the multi-consumer
    // barrier; ContextCleaner reclaims it when the plan is GC'd.
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val negatives = cand.filter(!probe)
    val positives = cand.filter(probe)
    negatives.unionByName(ExactSeen.notSeen(positives, seenP))
  }

  /** Incremental shard maintenance — fold a crawl batch's urls into an
    * EXISTING shard set without rebuilding it. At the 10^10-url regime the
    * seen set cannot be rebuilt per micro-batch (O(corpus) work for an
    * O(batch) delta); this cogroup touches only the buckets that own new
    * urls and streams every other shard through byte-untouched, so the
    * per-batch cost is O(batch + touched-shard bytes). Inserting keys into
    * the deserialized filter is bit-identical to OR-merging a delta filter
    * of the same keys (put() sets the same double-hash bit pattern), so
    * membership after k incremental rounds equals the one-shot build over
    * the union — asserted in BloomSpec. Buckets with no existing shard
    * (first urls to land there) get a fresh filter sized by
    * `expectedPerShard`/`fpp`.
    *
    * `n_items` counts keys FOLDED IN (the builder's semantics, buffer
    * count slot) — a Bloom filter cannot know distinct membership, so
    * replaying a batch inflates it while the bit array is unchanged.
    * Treat it as an upper bound on load when sizing reshards; the cuckoo
    * twin reports true `occupiedSlots` instead. */
  def insertShards(
      shards: Dataset[BloomShard],
      urls: DataFrame, // col: canonical_url
      numBuckets: Int,
      fpp: Double = 1e-4,
      salt: Long = DefaultSalt,
      expectedPerShard: Long = 1024L): Dataset[BloomShard] = {
    val spark = shards.sparkSession
    import spark.implicits._
    val keyed = urls
      .select(
        bucketCol(col("canonical_url"), numBuckets, salt).as("bucket"),
        UrlCanon.saltedKey(col("canonical_url"), salt).as("key"))
      .as[(Int, Long)]
    shards.groupByKey(_.bucket)
      .cogroup(keyed.groupByKey(_._1)) { (bucket, shardIt, keyIt) =>
        if (!keyIt.hasNext) shardIt // untouched shard passes through
        else {
          val existing = if (shardIt.hasNext) Some(shardIt.next()) else None
          val f = existing.map(s => Bloom.deserialize(s.blob))
            .getOrElse(Bloom.create(expectedPerShard, fpp))
          var n = existing.map(_.n_items).getOrElse(0L)
          keyIt.foreach { kv => f.put(kv._2); n += 1 }
          Iterator.single(BloomShard(bucket, f.serialize(), n))
        }
      }
  }

  /** Exact frontier-minus-seen for shard sets past the broadcast limit —
    * the cuckoo twin's composition ([[CuckooSeen.notSeenExactPartitioned]])
    * on Bloom shards: the co-partitioned probe splits the stream in place,
    * negatives (definitely unseen) pass, positives exact-confirm against
    * `seen`. `register` is REQUIRED: the post-probe stream is persisted
    * (two consumers) and only the caller knows when the lazy result has
    * materialized and the cache can go. */
  def notSeenExactPartitioned(
      candidates: DataFrame,
      shards: Dataset[BloomShard],
      seen: DataFrame, // col: canonical_url (exact-confirm side)
      numBuckets: Int,
      salt: Long,
      register: Dataset[_] => Unit): DataFrame = {
    val probed = probedStream(candidates, shards, numBuckets, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(probed)
    val negatives = probed.filter(!col("__hit")).drop("__hit")
    val positives = probed.filter(col("__hit")).drop("__hit")
    negatives.unionByName(ExactSeen.notSeen(positives, seen))
  }

  /** Cogroup prelude of the co-partitioned Bloom gates — delegates to the
    * shared [[GateProbe.probedStream]] (see there for why this is a
    * cogroup and not a join). */
  private def probedStream(
      candidates: DataFrame,
      shards: Dataset[BloomShard],
      numBuckets: Int,
      salt: Long): DataFrame =
    GateProbe.probedStream[BloomShard](candidates, shards, numBuckets, salt,
      _.bucket, s => Bloom.deserialize(s.blob).mightContain _)

  /** Cogroup-based gate for shard sets too big to broadcast: one shuffle
    * co-partitions candidates with their shard; each bucket's task
    * deserializes its one shard and streams candidates through it
    * ([[probedStream]]). */
  def gateNotSeenPartitioned(
      candidates: DataFrame,
      shards: Dataset[BloomShard],
      numBuckets: Int,
      salt: Long = DefaultSalt): DataFrame =
    probedStream(candidates, shards, numBuckets, salt)
      .filter(!col("__hit"))
      .drop("__hit")
}

/** Exact seen-set operators — the verification twin (SURVEY.md §7 step 4)
  * and the reference-equivalence path (reference seen-set:
  * csinsights/data/s2processor.py:55-61 `filtered_corpusids`). */
object ExactSeen {
  /** frontier-minus-seen (J4): candidates with no seen match. */
  def notSeen(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("canonical_url"), Seq("canonical_url"), "left_anti")

  /** candidates already seen (J2 semi). */
  def alreadySeen(candidates: DataFrame, seen: DataFrame): DataFrame =
    candidates.join(seen.select("canonical_url"), Seq("canonical_url"), "left_semi")
}
