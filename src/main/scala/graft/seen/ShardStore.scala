package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Batch-versioned cuckoo shard store — the CRASH-SAFE maintained seen
  * filter for the micro-batch crawl loop.
  *
  * The invariant that matters: a cuckoo gate is exact only if EVERY seen
  * url was inserted (a missing key probes negative and slips past the
  * gate). A naive "overwrite shards after each batch" breaks that on a
  * crash between the seen-table commit and the shard write — the batch is
  * marked done, never replayed, and the filter is permanently missing its
  * urls. This store makes the filter SELF-HEALING instead, with
  * SnapshotTable-style manifest versioning so per-batch WRITES are
  * O(touched-shard bytes), not O(total filter bytes):
  *
  *   - `blobs/delta-b<batchId>.parquet` holds ONLY the shards touched by
  *     that heal (immutable once its manifest lands);
  *   - `manifest-b<batchId>.json` maps every bucket to the blob file
  *     carrying its newest version (untouched buckets keep their old
  *     file refs — nothing is rewritten for them), written atomically
  *     (temp + rename) AFTER its delta parquet completes, so a crash
  *     mid-write leaves the previous manifest authoritative;
  *   - [[heal]] brings the newest version up to any target batch by
  *     folding the missing delta — queried FROM THE SEEN TABLE by its
  *     `first_batch_id` lineage column — through [[CuckooSeen.insert]]
  *     over just the touched base shards (fingerprint-idempotent, so
  *     healing a half-applied state is safe);
  *   - when a manifest references more than `compactEvery` distinct blob
  *     files, the next heal writes a full compacted version and prunes
  *     unreferenced blobs (bounding read fan-in and disk growth).
  *
  * Per-batch cost is O(batch + touched-shard bytes) for compute AND
  * writes; the seen table is only consulted for the (lineage-pruned)
  * healing delta.
  *
  * Paths use the local filesystem (the sandbox convention shared with
  * [[graft.tableio.SnapshotTable]]); a URI-schemed root (hdfs://, s3://)
  * is rejected loudly rather than silently degrading. */
final class ShardStore(
    val root: String,
    val numBuckets: Int,
    val salt: Long = BloomSeen.DefaultSalt,
    val expectedPerShard: Long = 1L << 16,
    val compactEvery: Int = 8) {

  require(!root.contains("://"),
    s"ShardStore root '$root' has a URI scheme — this store walks the LOCAL " +
    "filesystem (same convention as SnapshotTable); a remote root would " +
    "silently see no versions and degrade heal() to a full rebuild per batch")

  new java.io.File(root).mkdirs()
  new java.io.File(root, "blobs").mkdirs()

  private def manifestFile(b: Long) = new java.io.File(root, f"manifest-b$b%020d.json")
  private def deltaRel(b: Long) = f"blobs/delta-b$b%020d.parquet"

  /** Newest complete version's batch id, if any (manifest presence IS
    * completeness — it is written after its delta parquet). */
  def latestBatch: Option[Long] = {
    val fs = new java.io.File(root)
    Option(fs.listFiles())
      .map(_.toSeq.filter(f => f.isFile && f.getName.startsWith("manifest-b")))
      .filterNot(_.isEmpty)
      .map(_.map(_.getName.stripPrefix("manifest-b").stripSuffix(".json").toLong).max)
  }

  /** bucket → blob file (relative) of the newest version. */
  private def entries(b: Long): Map[Int, String] = {
    val txt = java.nio.file.Files.readString(manifestFile(b).toPath)
    "\"(\\d+)\":\"([^\"]+)\"".r.findAllMatchIn(txt)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
  }

  private def writeManifest(b: Long, es: Map[Int, String]): Unit = {
    val json = es.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
    val tmp = new java.io.File(root, s".manifest-b$b.tmp").toPath
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, manifestFile(b).toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def readFrom(spark: SparkSession, es: Map[Int, String],
      buckets: Option[Set[Int]] = None): Dataset[CuckooShard] = {
    import spark.implicits._
    val wanted = buckets.map(bs => es.view.filterKeys(bs).toMap).getOrElse(es)
    if (wanted.isEmpty) spark.emptyDataset[CuckooShard]
    else wanted.groupBy(_._2).map { case (file, owned) =>
      spark.read.parquet(s"$root/$file")
        .filter(col("bucket").isin(owned.keys.toSeq: _*))
        .as[CuckooShard]
    }.reduce(_ unionByName _)
  }

  /** The current shard set (empty if no version yet). */
  def current(spark: SparkSession): Dataset[CuckooShard] = {
    import spark.implicits._
    latestBatch.map(b => readFrom(spark, entries(b)))
      .getOrElse(spark.emptyDataset[CuckooShard])
  }

  /** Shards current through `upTo`: loads the newest version and, if it
    * lags, inserts the missing urls (`from < first_batch_id <= upTo`) from
    * the seen table's lineage column and persists a new version writing
    * ONLY the touched shards. Idempotent: healing an already-current
    * store is a pure read.
    *
    * `seen` may be the full table or a LINEAGE-PRUNED subset (e.g.
    * [[graft.tableio.SnapshotTable.readSinceBatch]] of commits after
    * [[latestBatch]]) — it only must contain every row with
    * `first_batch_id` in `(latestBatch, upTo]`; the filter here re-applies
    * either way, so over-approximating is safe and pruning makes the heal
    * read O(missed batches) instead of O(corpus). */
  def heal(spark: SparkSession, seen: DataFrame /* canonical_url, first_batch_id */,
      upTo: Long): Dataset[CuckooShard] = {
    val from = latestBatch
    if (from.exists(_ >= upTo)) current(spark)
    else {
      val oldEntries = from.map(entries).getOrElse(Map.empty)
      val delta = seen
        .filter(col("first_batch_id") > from.getOrElse(-1L) && col("first_batch_id") <= upTo)
        .select("canonical_url")
      // bounded tiny collect: at most numBuckets ints
      val touched = delta
        .select(BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      val mustCompact = (oldEntries.values.toSet + deltaRel(upTo)).size > compactEvery
      if (touched.isEmpty && !mustCompact) {
        // delta carries no keys (e.g. an empty batch) — advance the
        // version with the SAME entries so from catches up to upTo
        writeManifest(upTo, oldEntries)
        prune(keep = 2)
        current(spark)
      } else {
        val baseTouched = readFrom(spark, oldEntries, Some(touched))
        val updatedTouched =
          CuckooSeen.insert(baseTouched, delta, numBuckets, salt, expectedPerShard)
        val (toWrite, newEntries) =
          if (mustCompact) {
            // fold the untouched remainder in and write one full file
            val untouched = readFrom(spark, oldEntries.view.filterKeys(!touched(_)).toMap)
            (updatedTouched.unionByName(untouched),
              (oldEntries.keySet ++ touched).map(_ -> deltaRel(upTo)).toMap)
          } else {
            (updatedTouched,
              oldEntries ++ touched.map(_ -> deltaRel(upTo)))
          }
        toWrite.repartition(col("bucket"))
          .write.mode("overwrite").parquet(s"$root/${deltaRel(upTo)}")
        writeManifest(upTo, newEntries)
        prune(keep = 2)
        current(spark)
      }
    }
  }

  /** Drop all but the newest `keep` manifests and any blob file no kept
    * manifest references. */
  def prune(keep: Int): Unit = {
    val fs = new java.io.File(root)
    val manifests = Option(fs.listFiles()).map(_.toSeq
      .filter(f => f.isFile && f.getName.startsWith("manifest-b"))
      .sortBy(_.getName)).getOrElse(Seq.empty)
    val (drop, kept) = manifests.splitAt(math.max(0, manifests.size - keep))
    val live: Set[String] = kept
      .map(f => f.getName.stripPrefix("manifest-b").stripSuffix(".json").toLong)
      .flatMap(b => entries(b).values).toSet
    drop.foreach(_.delete())
    val blobDir = new java.io.File(root, "blobs")
    Option(blobDir.listFiles()).foreach(_.foreach { d =>
      if (!live.contains(s"blobs/${d.getName}")) deleteRec(d)
    })
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
}
