package graft.seen

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator building one Bloom filter per group (SURVEY §2.8:
  * "Seen-set shard builder → Aggregator").
  *
  * THE scale property: Spark runs Aggregators with map-side partial
  * aggregation, so each input partition folds its keys into a LOCAL bloom
  * buffer and the shuffle moves only (numBuckets × numPartitions) fixed-
  * size bit arrays — not the 10^10 keys. merge = bitwise OR (associative/
  * commutative, property-tested in BloomSpec), so partials combine to
  * exactly the single-pass filter.
  *
  * All shards share one (m, k) shape, sized up front from the expected
  * per-shard cardinality — mergeability requires equal shapes.
  */
class BloomAggregator(expectedPerShard: Long, fpp: Double)
    extends Aggregator[Long, Array[Long], (Array[Byte], Long)] {

  private val shape = Bloom.create(expectedPerShard, fpp)
  private val numWords = shape.bits.length
  private val numHashes = shape.numHashes

  // buffer = [bloom words..., item count] — the trailing slot carries n
  // through the same partial-merge machinery as the bits
  override def zero: Array[Long] = new Array[Long](numWords + 1)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    Bloom.putInto(buf, numWords.toLong * 64, numHashes, key)
    buf(numWords) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numWords) { a(i) |= b(i); i += 1 }
    a(numWords) += b(numWords)
    a
  }

  override def finish(buf: Array[Long]): (Array[Byte], Long) =
    (new Bloom(java.util.Arrays.copyOf(buf, numWords), numHashes).serialize(), buf(numWords))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[(Array[Byte], Long)] =
    Encoders.tuple(Encoders.BINARY, Encoders.scalaLong)
}
