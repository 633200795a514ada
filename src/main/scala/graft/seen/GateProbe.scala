package graft.seen

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

import graft.canon.UrlCanon

/** Shared cogroup prelude of the co-partitioned (past-broadcast-limit)
  * seen gates — one implementation for both filter families
  * ([[BloomSeen]]/[[CuckooSeen]] delegate here with their shard type and
  * deserializer).
  *
  * Candidates are keyed by salted bucket and COGROUPED with their shard,
  * probed once into a `__hit` column (original candidate columns +
  * `__hit`). __hit is never null — a missing shard is a definite miss.
  *
  * Why cogroup and not a join: a join materializes the shard BLOB into
  * the candidate stream, and every probe's `getBinary` then copies the
  * whole ~0.5 MB shard out of the joined row — per CANDIDATE ROW. The
  * per-(epoch,bucket) deserialization caches of rounds 2-3 only avoided
  * re-DESERIALIZING; the per-row copy remained and dominated end to end
  * (measured 12-17 s vs 0.9 s broadcast at 1M candidates × 32 shards —
  * both the broadcast-interleaved and forced-sort-merge join shapes).
  * Cogroup keeps blobs out of the candidate stream entirely: one shuffle
  * co-partitions both sides, each bucket's task deserializes its ONE
  * shard once and streams candidates through it — O(shard) memory, zero
  * per-row blob traffic, exactly the "each task streams its shard"
  * contract. The row boxing this costs is ~100 B/row against the 0.5
  * MB/row it removes, and the shape is scale-invariant (nothing for the
  * optimizer to flip to broadcast; plan-asserted in PlanSpec). */
private[seen] object GateProbe {

  def probedStream[S](
      candidates: DataFrame,
      shards: Dataset[S],
      numBuckets: Int,
      salt: Long,
      bucketOf: S => Int,
      membershipOf: S => (Long => Boolean)): DataFrame = {
    val n = candidates.columns.length
    val keyed = candidates
      .withColumn("__bucket", BloomSeen.bucketCol(col("canonical_url"), numBuckets, salt))
      .withColumn("__key", UrlCanon.saltedKey(col("canonical_url"), salt))
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = Encoders.row(
      StructType(candidates.schema.fields :+
        StructField("__hit", BooleanType, nullable = false)))
    implicit val intEnc: org.apache.spark.sql.Encoder[Int] = Encoders.scalaInt
    keyed.groupByKey(_.getInt(n))
      .cogroup(shards.groupByKey(bucketOf)) { (_, candIt, shardIt) =>
        val member: Long => Boolean =
          if (shardIt.hasNext) membershipOf(shardIt.next()) else null
        candIt.map { r =>
          val hit = member != null && member(r.getLong(n + 1))
          Row.fromSeq((0 until n).map(r.get) :+ hit)
        }
      }
  }
}
