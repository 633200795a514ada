package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.UrlCanon

/** One serialized cuckoo shard per salted bucket. */
final case class CuckooShard(bucket: Int, blob: Array[Byte], n_items: Long)

/** Partitioned CUCKOO URL-seen set — the north rule's second filter shape,
  * sharing [[BloomSeen]]'s distribution scheme (shard per salted-hash
  * bucket, broadcast-probe gate, exact-confirm composition) but adding
  * DELETION: a url can be forgotten to schedule a re-crawl without
  * rebuilding the shard — Bloom cannot unset bits.
  *
  * Trade-off vs Bloom, by construction: Bloom overfill degrades gracefully
  * (fpp rises); a cuckoo shard past ~95% load FAILS the insert. A dropped
  * key would be a silent exactness violation (seen url re-fetched), so the
  * builder throws on overflow — size shards with headroom (create() sizes
  * to 80%).
  */
object CuckooSeen {

  /** Build shards grouped by salted bucket. Map-side partials (same
    * Aggregator machinery as Bloom): each input partition folds its keys
    * into a local table; partials combine by fingerprint reinsertion
    * (membership-preserving — cuckoo has no byte-deterministic OR-merge,
    * so MEMBERSHIP is the contract, asserted in CuckooSeenSpec).
    * DUPLICATE-TOLERANT like the Bloom path: [[Cuckoo]] inserts are
    * idempotent at the fingerprint level (set semantics), so repeated
    * canonical_urls — within a partition or meeting at partial-merge —
    * store one copy and can never overfill a shard. */
  def buildShards(
      seen: DataFrame, // col: canonical_url
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 0L): Dataset[CuckooShard] = {
    val spark = seen.sparkSession
    import spark.implicits._
    val expect =
      if (expectedPerShard > 0) expectedPerShard
      else math.max(seen.count() / numBuckets + 1, 1024L)
    val keyed = seen
      .select(
        BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt).as("bucket"),
        UrlCanon.saltedKey(col("canonical_url"), salt).as("key"))
      .as[(Int, Long)]
    val agg = new CuckooAggregator(expect).toColumn
    keyed.groupByKey(_._1).mapValues(_._2)
      .agg(agg)
      .map { case (bucket, (blob, n)) => CuckooShard(bucket, blob, n) }
  }

  /** Bloom-style broadcast gate: candidates the cuckoo set does NOT
    * contain. No join; probe runs inside codegen via [[graft.functions
    * .CuckooProbeExpr]]. */
  def gateNotSeen(
      candidates: DataFrame,
      shards: Dataset[CuckooShard],
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt): DataFrame = {
    import graft.functions.{CuckooProbeExpr, CuckooShardMap}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    val shardMap = new CuckooShardMap(
      shards.collect().map(s => s.bucket -> s.blob).toMap)
    val bc = spark.sparkContext.broadcast(shardMap)
    val probe = Bridge.column(CuckooProbeExpr(
      Bridge.expression(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    candidates.filter(!probe)
  }

  /** Cogroup-based gate for shard sets past the broadcast limit (the
    * 10^10-url regime: e.g. 512 × ~50 MB shards ≈ 25 GB — collect+
    * broadcast is off the table). One shuffle co-partitions candidates
    * with their shard on the salted bucket; each task deserializes its one
    * shard once and streams candidates through it (see [[probedStream]]
    * for why this is a cogroup, not a join). Mirror of
    * [[BloomSeen.gateNotSeenPartitioned]]. */
  def gateNotSeenPartitioned(
      candidates: DataFrame,
      shards: Dataset[CuckooShard],
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt): DataFrame = {
    probedStream(candidates, shards, numBuckets, salt)
      .filter(!col("__hit"))
      .drop("__hit")
  }

  /** Cogroup prelude of the co-partitioned cuckoo gates — delegates to the
    * shared [[GateProbe.probedStream]] (see there for why this is a
    * cogroup and not a join). */
  private[seen] def probedStream(
      candidates: DataFrame,
      shards: Dataset[CuckooShard],
      numBuckets: Int,
      salt: Long): DataFrame =
    GateProbe.probedStream[CuckooShard](candidates, shards, numBuckets, salt,
      _.bucket, s => Cuckoo.deserialize(s.blob).mightContain _)

  /** Exact frontier-minus-seen with a cuckoo fast path (same composition
    * as [[BloomSeen.notSeenExactWithBloomFastPath]]): negatives definitely
    * unseen → pass; positives exact-confirmed. Row-equal to a plain exact
    * anti join (asserted in CuckooSeenSpec).
    *
    * Cache lifecycle: both inputs are persisted (each is consumed more than
    * once by the composed plan — Catalyst would otherwise recompute the
    * full upstream derivation per consumer) and stay cached after return
    * because the result is LAZY — the exact-confirm branch still needs them
    * when the caller materializes. Callers own the release: a long-lived
    * session invoking the gate repeatedly should unpersist via
    * `spark.sharedState.cacheManager.clearCache()` (or persist/unpersist
    * the inputs themselves around the call) once the result is consumed. */
  def notSeenExactWithCuckooFastPath(
      candidates: DataFrame,
      seen: DataFrame,
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 0L): DataFrame = {
    import graft.functions.{CuckooProbeExpr, CuckooShardMap}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    // seen is consumed three times (sizing count, shard build, exact
    // confirm) — persist so the derivation pipeline runs once
    val seenP = seen.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shards = buildShards(seenP, numBuckets, salt, expectedPerShard)
    val shardMap = new CuckooShardMap(shards.collect().map(s => s.bucket -> s.blob).toMap)
    val bc = spark.sparkContext.broadcast(shardMap)
    val probe = Bridge.column(CuckooProbeExpr(
      Bridge.expression(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val negatives = cand.filter(!probe)
    val positives = cand.filter(probe)
    negatives.unionByName(ExactSeen.notSeen(positives, seenP))
  }

  /** Per-JVM memo of BUILT shard blobs, keyed by caller-chosen corpus tag
    * (same pattern as [[graft.ops.Ivf.trainCached]] for centroids): the
    * filter is a property of the SEEN CORPUS, not of any query, so a
    * session gating repeated frontier batches against the same corpus
    * must not pay the O(corpus) shard build per call. Payload is
    * numBuckets blobs (MBs at bench scale); entries live for the JVM.
    *
    * CONTRACT — the tag names an IMMUTABLE corpus snapshot. The memo has
    * no change detection: gating against a tag whose underlying seen set
    * has since GROWN would probe a stale filter, and the new urls would
    * pass the "definitely unseen" branch un-confirmed — an exactness
    * violation. When the corpus changes, either use a new tag (include a
    * version/batch id in it), call [[evictShards]], or — the real
    * growing-corpus path — maintain the filter incrementally via
    * [[insert]]/[[ShardStore]] instead of memoizing builds. */
  private val builtShardCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Array[Byte]]]()

  /** Per-JVM memo of the BROADCAST shard map, keyed by (applicationId,
    * corpus tag, geometry). Without it a per-micro-batch caller of
    * [[notSeenExactWithCuckooCached]] against the same corpus would ship a
    * fresh multi-MB Broadcast of the full shard map every call and leave
    * collection to the ContextCleaner's whim — the blob memo alone does
    * not stop the broadcast-payload accumulation. applicationId scopes
    * entries to the owning SparkContext (a broadcast is dead once its
    * context stops; a restarted context gets a new id and fresh entries). */
  private val shardBroadcastCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.broadcast.Broadcast[graft.functions.CuckooShardMap]]()

  private def broadcastCached(
      spark: SparkSession,
      corpusTag: String,
      seen: DataFrame,
      numBuckets: Int,
      salt: Long,
      expectedPerShard: Long): org.apache.spark.broadcast.Broadcast[graft.functions.CuckooShardMap] =
    shardBroadcastCache.computeIfAbsent(
      s"${spark.sparkContext.applicationId}#$corpusTag#$numBuckets#$salt", _ =>
        spark.sparkContext.broadcast(new graft.functions.CuckooShardMap(
          shardsCached(corpusTag, seen, numBuckets, salt, expectedPerShard))))

  /** The corpusTag segment of a broadcast-cache key
    * (`appId#corpusTag#numBuckets#salt`): strip the #-free appId prefix
    * and the two #-free numeric suffixes — exact even when the tag itself
    * contains '#'. A substring `contains("#tag#")` test would let a tag
    * like "8" match ANOTHER tag's `…#8#…` numBuckets segment and evict a
    * live broadcast that the memo exists to keep. */
  private def broadcastKeyTag(key: String): String = {
    val afterApp = key.substring(key.indexOf('#') + 1)
    val beforeSalt = afterApp.lastIndexOf('#')
    val beforeBuckets = afterApp.lastIndexOf('#', beforeSalt - 1)
    afterApp.substring(0, beforeBuckets)
  }

  /** Drop every memoized build for `corpusTag` (any bucket count/salt) —
    * call after the corpus snapshot behind the tag changes. Also releases
    * the tag's memoized broadcasts (removeBroadcast, not destroy: an
    * in-flight job of another caller may still hold the old value; the
    * unpersist path lets executors drop the blocks safely). */
  def evictShards(corpusTag: String): Unit = {
    // same exact-segment rule for the blob memo (`corpusTag#buckets#salt`,
    // two #-free numeric suffixes): a bare startsWith(tag + "#") would let
    // tag "a" evict tag "a#b"'s build when tags themselves contain '#'
    builtShardCache.keySet.removeIf { k =>
      val beforeSalt = k.lastIndexOf('#')
      val beforeBuckets = k.lastIndexOf('#', beforeSalt - 1)
      beforeBuckets >= 0 && k.substring(0, beforeBuckets) == corpusTag
    }
    val it = shardBroadcastCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (broadcastKeyTag(e.getKey) == corpusTag) {
        scala.util.Try(e.getValue.unpersist(blocking = false))
        it.remove()
      }
    }
  }

  def shardsCached(
      corpusTag: String,
      seen: DataFrame,
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 0L): Map[Int, Array[Byte]] =
    builtShardCache.computeIfAbsent(s"$corpusTag#$numBuckets#$salt", _ =>
      // No persist/unpersist here: the memo already bounds the build to
      // once per corpus (a double scan of `seen` on that one build is
      // fine), and an unpersist would EVICT a caller-managed cache of the
      // same plan — e.g. the session-cached seen fixture that the gate's
      // exact-confirm branch and the other seen-consumers keep reading.
      buildShards(seen, numBuckets, salt, expectedPerShard)
        .collect().map(s => s.bucket -> s.blob).toMap)

  /** [[notSeenExactWithPrebuilt]] over the per-JVM shard memo — the
    * steady-state gate shape for a session that probes one IMMUTABLE
    * corpus snapshot many times (first call builds and memoizes; every
    * later call only probes + exact-confirms; see the [[shardsCached]]
    * contract for what "immutable" buys and costs). Row-equal to the
    * plain exact anti join like every other composition here
    * (CuckooSeenSpec).
    *
    * `register` receives the internally persisted candidates so the
    * caller can unpersist once the lazy result has materialized — same
    * reasoning as [[notSeenExactPartitioned]]'s required hook. Callers
    * that invoke this with the SAME candidates plan every time (e.g. a
    * fixed benchmark query) may pass a no-op: CacheManager dedupes
    * plan-equal entries, so nothing accumulates; per-batch DIFFERENT
    * candidate plans without release would leak one entry per call. */
  def notSeenExactWithCuckooCached(
      corpusTag: String,
      candidates: DataFrame,
      seen: DataFrame,
      numBuckets: Int,
      register: Dataset[_] => Unit,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 0L): DataFrame = {
    import graft.functions.CuckooProbeExpr
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    // broadcast memoized alongside the blobs: repeated per-batch calls
    // reuse ONE broadcast instead of accumulating a fresh payload per call
    val bc = broadcastCached(spark, corpusTag, seen, numBuckets, salt, expectedPerShard)
    val probe = Bridge.column(CuckooProbeExpr(
      Bridge.expression(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(cand)
    val negatives = cand.filter(!probe)
    val positives = cand.filter(probe)
    negatives.unionByName(ExactSeen.notSeen(positives, seen))
  }

  /** Exact frontier-minus-seen against PRE-BUILT shards (the maintained-
    * filter path): unlike [[notSeenExactWithCuckooFastPath]] there is no
    * per-call shard build — the filter is corpus state kept current by
    * [[insert]] (see [[ShardStore]]). Negatives are definitely unseen and
    * pass without join work; positives (true hits + fingerprint fps) are
    * exact-confirmed against `seen`, so the anti-join's probe side shrinks
    * from |candidates| to |candidates ∩ seen| + fp. */
  def notSeenExactWithPrebuilt(
      candidates: DataFrame,
      shards: Dataset[CuckooShard],
      seen: DataFrame, // col: canonical_url (exact-confirm side)
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt): DataFrame = {
    import graft.functions.{CuckooProbeExpr, CuckooShardMap}
    import org.apache.spark.sql.graftbridge.Bridge
    val spark = candidates.sparkSession
    val shardMap = new CuckooShardMap(shards.collect().map(s => s.bucket -> s.blob).toMap)
    val bc = spark.sparkContext.broadcast(shardMap)
    val probe = Bridge.column(CuckooProbeExpr(
      Bridge.expression(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt)),
      Bridge.expression(UrlCanon.saltedKey(col("canonical_url"), salt)),
      bc))
    val cand = candidates.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val negatives = cand.filter(!probe)
    val positives = cand.filter(probe)
    negatives.unionByName(ExactSeen.notSeen(positives, seen))
  }

  /** Exact frontier-minus-seen for shard sets PAST the broadcast limit —
    * the composition [[notSeenExactWithPrebuilt]] cannot use (it collects
    * and broadcasts the whole shard set; at 512 × ~50 MB that is 25 GB on
    * the driver). One shuffle co-partitions candidates with their shard;
    * the probe splits the co-partitioned stream in place (negatives pass,
    * positives exact-confirm against `seen`) with the same per-(epoch,
    * bucket) cached deserialization as [[gateNotSeenPartitioned]].
    * Row-equal to a plain exact anti join (CuckooSeenSpec). */
  def notSeenExactPartitioned(
      candidates: DataFrame,
      shards: Dataset[CuckooShard],
      seen: DataFrame, // col: canonical_url (exact-confirm side)
      numBuckets: Int,
      salt: Long,
      // REQUIRED, no default: the probed stream is persisted (two
      // consumers must not re-run the shuffle+probe) and the result is
      // lazy, so only the caller knows when the cache can go. Register
      // the dataset and unpersist it after the result materializes; a
      // silent default here would leak one cache entry per call.
      register: Dataset[_] => Unit): DataFrame = {
    // persist the POST-JOIN probe result, not the raw candidates: the
    // cached rows carry only a boolean extra (blob dropped by the
    // prelude's projection)
    val withKey = probedStream(candidates, shards, numBuckets, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(withKey)
    val negatives = withKey.filter(!col("__hit")).drop("__hit")
    val positives = withKey.filter(col("__hit")).drop("__hit")
    negatives.unionByName(ExactSeen.notSeen(positives, seen))
  }

  /** Persist shards as a parquet table partitioned-in-files by bucket.
    * The shard set IS the crawl's cross-session seen state — write after
    * each maintenance round ([[insert]]/[[forget]]), read at campaign
    * start. Blobs are opaque binary: parquet round-trips them exactly
    * (asserted gate-identical in SeenMaintenanceSpec). Repartitioning on
    * bucket keeps one shard per row-group so a selective read of hot
    * buckets stays cheap at 10^10-regime shard counts. */
  def writeShards(shards: Dataset[CuckooShard], path: String): Unit =
    shards.repartition(col("bucket")).write.mode("overwrite").parquet(path)

  def readShards(spark: SparkSession, path: String): Dataset[CuckooShard] = {
    import spark.implicits._
    spark.read.parquet(path).as[CuckooShard]
  }

  /** Incremental INSERT twin of [[forget]]: fold a crawl batch's urls into
    * an existing shard set without the O(corpus) rebuild — the per-batch
    * maintenance path of the 10^10-url crawl loop (see
    * [[BloomSeen.insertShards]] for the cost argument). Only buckets that
    * own new urls deserialize/rewrite; untouched shards pass through
    * byte-identical. Inserts are fingerprint-idempotent, so replaying a
    * batch (resume) cannot overfill a shard. Overflow of genuinely new
    * keys THROWS (a silently dropped key is an exactness violation) —
    * size the original build with headroom, or reshard. Buckets with no
    * existing shard get a fresh table sized by `expectedPerShard`. */
  def insert(
      shards: Dataset[CuckooShard],
      urls: DataFrame, // col: canonical_url
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 1024L): Dataset[CuckooShard] = {
    val spark = shards.sparkSession
    import spark.implicits._
    val keyed = urls
      .select(
        BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt).as("bucket"),
        UrlCanon.saltedKey(col("canonical_url"), salt).as("key"))
      .as[(Int, Long)]
    shards.groupByKey(_.bucket)
      .cogroup(keyed.groupByKey(_._1)) { (bucket, shardIt, keyIt) =>
        if (!keyIt.hasNext) shardIt
        else {
          val existing = if (shardIt.hasNext) Some(shardIt.next()) else None
          val f = existing.map(s => Cuckoo.deserialize(s.blob))
            .getOrElse(Cuckoo.create(expectedPerShard))
          keyIt.foreach { kv =>
            if (!f.insert(kv._2))
              throw new IllegalStateException(
                s"cuckoo shard $bucket overflow on incremental insert — reshard")
          }
          Iterator.single(CuckooShard(bucket, f.serialize(), f.occupiedSlots))
        }
      }
  }

  /** FORGET urls to schedule a re-crawl (the primitive Bloom lacks):
    * rebuild the TOUCHED shards from the authoritative seen set minus the
    * forgotten urls; untouched shards pass through unchanged.
    *
    * Why rebuild instead of fingerprint deletion: with set-semantics
    * (idempotent) inserts, two DISTINCT keys colliding on (fingerprint,
    * bucket pair) store ONE copy — a raw `Cuckoo.delete` of one key would
    * silently false-negative the other, and a seen url would slip through
    * the gate's "definitely unseen" branch un-confirmed (the cuckoo
    * paper's delete is only safe under counting semantics, which in turn
    * breaks replay idempotence). Rebuilding the owning shards from truth
    * is collision-proof by construction and bounded: cost is
    * O(seen/numBuckets × touched buckets), and a re-crawl batch salted
    * over many shards touches few of each shard's keys but only its own
    * buckets. Gate-equal to a from-scratch build over seen∖forgotten
    * (asserted in CuckooSeenSpec). */
  def forget(
      shards: Dataset[CuckooShard],
      urls: DataFrame, // col: canonical_url — urls to forget
      seen: DataFrame, // col: canonical_url — authoritative current membership
      numBuckets: Int,
      salt: Long = BloomSeen.DefaultSalt,
      expectedPerShard: Long = 0L): Dataset[CuckooShard] = {
    import org.apache.spark.sql.functions.broadcast
    val spark = shards.sparkSession
    import spark.implicits._
    val touched = urls
      .select(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt).as("__tb"))
      .distinct()
    val keep = seen
      .join(urls.select("canonical_url"), Seq("canonical_url"), "left_anti")
      .withColumn("__b", BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt))
      .join(broadcast(touched), col("__b") === col("__tb"), "left_semi")
      .select("canonical_url")
    val expect =
      if (expectedPerShard > 0) expectedPerShard
      else {
        val nT = math.max(touched.count(), 1L)
        math.max(keep.count() / nT + 1, 1024L)
      }
    val rebuilt = buildShards(keep, numBuckets, salt, expect)
    val untouched = shards
      .join(broadcast(touched), shards("bucket") === col("__tb"), "left_anti")
      .as[CuckooShard]
    untouched.unionByName(rebuilt)
  }
}

/** Typed Aggregator building one cuckoo filter per bucket group. Buffer is
  * the raw fingerprint table (Array[Short]); partial buffers merge by
  * fingerprint reinsertion. Overflow THROWS (see [[CuckooSeen]] scaladoc —
  * a silently dropped key would be an exactness violation). */
class CuckooAggregator(expectedPerShard: Long)
    extends org.apache.spark.sql.expressions.Aggregator[Long, Array[Short], (Array[Byte], Long)] {

  // geometry only — don't hold (and serialize with the closure) a dead table
  private val (numBuckets, bucketSize, maxKicks) = {
    val s = Cuckoo.create(expectedPerShard)
    (s.numBuckets, s.bucketSize, s.maxKicks)
  }

  private def view(buf: Array[Short]): Cuckoo =
    new Cuckoo(buf, numBuckets, bucketSize, maxKicks)

  override def zero: Array[Short] = new Array[Short](numBuckets * bucketSize)

  override def reduce(buf: Array[Short], key: Long): Array[Short] = {
    if (!view(buf).insert(key))
      throw new IllegalStateException(
        s"cuckoo shard overflow at expectedPerShard=$expectedPerShard — resize shards")
    buf
  }

  override def merge(a: Array[Short], b: Array[Short]): Array[Short] = {
    if (!view(a).mergeFrom(view(b)))
      throw new IllegalStateException(
        s"cuckoo shard overflow on merge at expectedPerShard=$expectedPerShard — resize shards")
    a
  }

  override def finish(buf: Array[Short]): (Array[Byte], Long) = {
    val f = view(buf)
    (f.serialize(), f.occupiedSlots)
  }

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Short]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Short]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[(Array[Byte], Long)] =
    org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.BINARY, org.apache.spark.sql.Encoders.scalaLong)
}
