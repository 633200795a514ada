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
  * urls. This store makes the filter SELF-HEALING instead:
  *
  *   - each shard version lives in `root/shards_b<batchId>` (immutable,
  *     parquet-atomic via _SUCCESS, like [[graft.tableio.SnapshotTable]]
  *     commits);
  *   - [[heal]] brings the newest version up to any target batch by
  *     folding the missing delta — queried FROM THE SEEN TABLE by its
  *     `first_batch_id` lineage column — through [[CuckooSeen.insert]]
  *     (fingerprint-idempotent, so healing a half-applied state is safe);
  *   - old versions are pruned lazily, keeping one predecessor.
  *
  * Per-batch cost is O(batch + touched-shard bytes), never O(corpus); the
  * seen table is only consulted for the (tiny) healing delta.
  */
final class ShardStore(
    val root: String,
    val numBuckets: Int,
    val salt: Long = BloomSeen.DefaultSalt,
    val expectedPerShard: Long = 1L << 16) {

  private def dir(b: Long): String = f"$root/shards_b$b%020d"

  /** Newest complete shard version's batch id, if any. */
  def latestBatch: Option[Long] = {
    val fs = new java.io.File(root)
    Option(fs.listFiles())
      .map(_.toSeq.filter(f => f.isDirectory && f.getName.startsWith("shards_b")
        && new java.io.File(f, "_SUCCESS").exists()))
      .filterNot(_.isEmpty)
      .map(_.map(_.getName.stripPrefix("shards_b").toLong).max)
  }

  /** Shards current through `upTo`: loads the newest version and, if it
    * lags, inserts the missing urls (`from < first_batch_id <= upTo`) from
    * the seen table's lineage column and persists the healed version.
    * Idempotent: healing an already-current store is a pure read.
    *
    * `seen` may be the full table or a LINEAGE-PRUNED subset (e.g.
    * [[graft.tableio.SnapshotTable.readSinceBatch]] of commits after
    * [[latestBatch]]) — it only must contain every row with
    * `first_batch_id` in `(latestBatch, upTo]`; the filter here re-applies
    * either way, so over-approximating is safe and pruning makes the heal
    * read O(missed batches) instead of O(corpus). */
  def heal(spark: SparkSession, seen: DataFrame /* canonical_url, first_batch_id */,
      upTo: Long): Dataset[CuckooShard] = {
    import spark.implicits._
    val cur = latestBatch
    val base = cur.map(b => CuckooSeen.readShards(spark, dir(b)))
      .getOrElse(spark.emptyDataset[CuckooShard])
    val from = cur.getOrElse(-1L)
    if (from >= upTo) base
    else {
      val delta = seen
        .filter(col("first_batch_id") > from && col("first_batch_id") <= upTo)
        .select("canonical_url")
      val updated = CuckooSeen.insert(base, delta, numBuckets, salt, expectedPerShard)
      CuckooSeen.writeShards(updated, dir(upTo))
      prune(keep = 2)
      CuckooSeen.readShards(spark, dir(upTo))
    }
  }

  /** Drop all but the newest `keep` versions. */
  def prune(keep: Int): Unit = {
    val fs = new java.io.File(root)
    val versions = Option(fs.listFiles()).map(_.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("shards_b"))
      .sortBy(_.getName)).getOrElse(Seq.empty)
    versions.dropRight(keep).foreach(deleteRec)
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete(); ()
  }
}
