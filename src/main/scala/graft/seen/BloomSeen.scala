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

  /** Build shards with a per-bucket fold: one shuffle (groupByKey on
    * bucket), executors stream keys into the filter — the driver never
    * sees a url. `expectedPerBucket` sizes each shard. */
  def buildShards(
      seen: DataFrame, // col: canonical_url
      numBuckets: Int,
      fpp: Double = 1e-4,
      salt: Long = DefaultSalt): Dataset[BloomShard] = {
    val spark = seen.sparkSession
    import spark.implicits._
    val keyed = seen
      .select(
        bucketCol(col("canonical_url"), numBuckets, salt).as("bucket"),
        UrlCanon.saltedKey(col("canonical_url"), salt).as("key"))
      .as[(Int, Long)]
    // Aggregator-style per-group fold; mapGroups streams the iterator so
    // memory per task = one Bloom shard, independent of group size.
    keyed.groupByKey(_._1).mapGroups { (bucket, rows) =>
      var n = 0L
      var bloom: Bloom = null
      var pending = List.empty[Long] // keys seen before sizing
      val it = rows.map(_._2)
      // size lazily: buffer up to 1<<20 keys, then size for 4x that
      val buf = new scala.collection.mutable.ArrayBuffer[Long]()
      var sized = false
      it.foreach { k =>
        if (!sized) {
          buf += k
          if (buf.length >= (1 << 20)) {
            bloom = Bloom.create(buf.length.toLong * 4, fpp)
            buf.foreach(bloom.put); buf.clear(); sized = true
          }
        } else bloom.put(k)
        n += 1
      }
      if (!sized) { bloom = Bloom.create(math.max(buf.length, 1), fpp); buf.foreach(bloom.put) }
      pending = Nil
      BloomShard(bucket, bloom.serialize(), n)
    }
  }

  /** Filter `candidates` (must carry canonical_url) down to rows the Bloom
    * set does NOT contain (the no-false-negative fast path of the
    * frontier-minus-seen anti join). Co-partitions candidates with shards
    * on the salted bucket; the shard side is tiny relative to candidates,
    * so AQE will broadcast it when it fits. */
  def gateNotSeen(
      candidates: DataFrame,
      shards: Dataset[BloomShard],
      numBuckets: Int,
      salt: Long = DefaultSalt): DataFrame = {
    import graft.functions.graftfns
    val withKey = candidates
      .withColumn("__bucket", bucketCol(col("canonical_url"), numBuckets, salt))
      .withColumn("__key", UrlCanon.saltedKey(col("canonical_url"), salt))
    withKey
      .join(shards.toDF().withColumnRenamed("bucket", "__bucket"),
        Seq("__bucket"), "left")
      .filter(col("blob").isNull || !graftfns.bloomMightContain(col("blob"), col("__key")))
      .drop("__bucket", "__key", "blob", "n_items")
  }
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
