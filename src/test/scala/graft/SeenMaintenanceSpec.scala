package graft

import org.apache.spark.sql.functions._

import graft.queries.Fixture
import graft.seen.{BloomSeen, ExactSeen}

/** Incremental Bloom shard maintenance: folding micro-batches into an
  * existing shard set must gate exactly like a one-shot build over the
  * union (insert == OR-merge of a delta, same double-hash bit pattern),
  * touch only the buckets owning new urls, and create shards for buckets
  * seen for the first time. */
class SeenMaintenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = 8

  private def cand = Fixture.frontier(spark, dir)
    .select(graft.canon.UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
    .distinct()
  private def seen = Fixture.seenSet(spark, dir)

  test("insertShards over micro-batches gates bit-identically to the one-shot build") {
    val ordered = seen.orderBy("canonical_url")
    val n = ordered.count().toInt
    val half = ordered.limit(n / 2)
    val rest = ordered.exceptAll(half)
    val b1 = rest.orderBy("canonical_url").limit((n - n / 2) / 2)
    val b2 = rest.exceptAll(b1)
    // geometry must match across build+inserts for bit-identity of blobs
    val exp = 8192L
    val incr = BloomSeen.insertShards(
      BloomSeen.insertShards(
        BloomSeen.buildShards(half, B, expectedPerShard = exp), b1, B, expectedPerShard = exp),
      b2, B, expectedPerShard = exp)
    val full = BloomSeen.buildShards(seen, B, expectedPerShard = exp)
    // blob-level equality: insert == OR-merge ⇒ same bits, not merely the
    // same gate behavior
    val ib = incr.collect().map(s => s.bucket -> s.blob.toSeq).toMap
    val fb = full.collect().map(s => s.bucket -> s.blob.toSeq).toMap
    assert(ib == fb, s"blobs diverged on buckets ${ib.keySet union fb.keySet filter (k => ib.get(k) != fb.get(k))}")
    // and the gate has no false negatives
    val gated = BloomSeen.gateNotSeen(cand, incr, B)
    assert(ExactSeen.alreadySeen(gated, seen).count() == 0)
  }

  test("Bloom partitioned exact composition is row-equal to the exact anti join") {
    val exact = ExactSeen.notSeen(cand, seen).collect().map(_.getString(0)).toSet
    val shards = BloomSeen.buildShards(seen, B)
    val pinned = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Dataset[_]]()
    val part = BloomSeen.notSeenExactPartitioned(cand, shards, seen, B,
        BloomSeen.DefaultSalt, register = pinned += _)
      .collect().map(_.getString(0)).toSet
    pinned.foreach(_.unpersist())
    assert(part == exact, s"diff: ${(part diff exact).take(3)} / ${(exact diff part).take(3)}")
  }

  test("untouched shards pass through byte-identical; empty buckets gain shards") {
    val tiny = seen.orderBy("canonical_url").limit(3)
    val base = BloomSeen.buildShards(tiny, B, expectedPerShard = 8192)
    assert(base.count() < B)
    // insert a batch that hits a strict subset of buckets
    val batch = seen.orderBy(desc("canonical_url")).limit(100)
    val touched = batch
      .select(BloomSeen.bucketCol(col("canonical_url"), B, BloomSeen.DefaultSalt).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val updated = BloomSeen.insertShards(base, batch, B, expectedPerShard = 8192)
    val before = base.collect().map(s => s.bucket -> s.blob.toSeq).toMap
    val after = updated.collect().map(s => s.bucket -> s.blob.toSeq).toMap
    before.foreach { case (bk, blob) =>
      if (!touched(bk)) assert(after(bk) == blob, s"untouched shard $bk rewritten")
    }
    assert(after.keySet == before.keySet ++ touched, "new buckets not created")
  }

  test("ShardStore versions write ONLY touched shards; compaction bounds file fan-in; remote roots rejected") {
    import graft.seen.ShardStore
    import org.apache.spark.sql.DataFrame
    val root = java.nio.file.Files.createTempDirectory("shardstore-v").toString + "/store"
    val store = new ShardStore(root, numBuckets = 8, expectedPerShard = 8192, compactEvery = 3)
    def lineage(urls: DataFrame, b: Long) = urls.withColumn("first_batch_id", lit(b))
    def touchedOf(urls: DataFrame) = urls
      .select(graft.seen.BloomSeen.bucketCol(col("canonical_url"), 8, graft.seen.BloomSeen.DefaultSalt).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet

    val all = seen.orderBy("canonical_url")
    val b0 = all.limit(40)
    store.heal(spark, lineage(b0, 0), 0)
    assert(store.latestBatch.contains(0L))

    // a small second batch touches a subset of buckets — its delta file
    // must contain EXACTLY those shards, nothing else rewritten
    val b1 = all.exceptAll(b0).limit(5)
    store.heal(spark, lineage(b1, 1), 1)
    val delta1 = spark.read.parquet(s"$root/blobs/delta-b${"%020d".format(1)}.parquet")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(delta1 == touchedOf(b1), s"delta file buckets $delta1 != touched ${touchedOf(b1)}")

    // completeness after both versions: every inserted url probes positive
    val inserted = b0.unionByName(b1)
    assert(graft.seen.CuckooSeen.gateNotSeen(inserted, store.current(spark), 8).count() == 0)

    // push past compactEvery distinct files → one compacted file, and the
    // filter stays complete
    var handed = b0.unionByName(b1)
    (2L to 5L).foreach { b =>
      val next = all.exceptAll(handed).limit(3)
      store.heal(spark, lineage(next, b), b)
      handed = handed.unionByName(next)
    }
    assert(graft.seen.CuckooSeen.gateNotSeen(handed, store.current(spark), 8).count() == 0)
    val blobFiles = new java.io.File(root, "blobs").listFiles().map(_.getName).toSet
    assert(blobFiles.size <= 3, s"compaction/prune failed to bound blobs: $blobFiles")

    intercept[IllegalArgumentException](new ShardStore("s3://bucket/x", 8))
  }

  test("cuckoo shards round-trip through parquet and keep gating identically (cross-session seen state)") {
    import graft.seen.CuckooSeen
    val shards = CuckooSeen.buildShards(seen, B, expectedPerShard = 8192)
    val path = java.nio.file.Files.createTempDirectory("shardstore").toString + "/shards"
    CuckooSeen.writeShards(shards, path)
    val restored = CuckooSeen.readShards(spark, path)
    val a = CuckooSeen.gateNotSeen(cand, shards, B).collect().map(_.getString(0)).toSet
    val b = CuckooSeen.gateNotSeen(cand, restored, B).collect().map(_.getString(0)).toSet
    assert(a == b)
    // and the restored set keeps accepting incremental maintenance
    val more = cand.exceptAll(seen).orderBy("canonical_url").limit(100)
    val updated = CuckooSeen.insert(restored, more, B, expectedPerShard = 8192)
    assert(CuckooSeen.gateNotSeen(more, updated, B).count() == 0)
  }
}
