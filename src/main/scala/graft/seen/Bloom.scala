package graft.seen

/** Compact deterministic Bloom filter over 64-bit keys.
  *
  * Double hashing (Kirsch–Mitzenmacher): g_i(x) = h1(x) + i*h2(x), with
  * h1/h2 derived from a splitmix64 finalizer — bit-stable across JVMs and
  * independent of the partitioning hash (the key is already
  * xxhash64(canonical_url, salt) computed Spark-side).
  *
  * Shards built per salted bucket are merged by bitwise OR
  * ([[Bloom.merge]]) — associative + commutative, so partial shards from
  * any partitioning of the input merge to the same filter (property-tested
  * in BloomSpec). No false negatives by construction.
  */
final class Bloom(val bits: Array[Long], val numHashes: Int) extends Serializable {
  def numBits: Long = bits.length.toLong * 64

  @inline private def mix(z0: Long): Long = Bloom.mixStatic(z0)

  def put(key: Long): Unit = Bloom.putInto(bits, numBits, numHashes, key)

  def mightContain(key: Long): Boolean = {
    val h1 = mix(key)
    val h2 = mix(key ^ 0xdeadbeefcafe1234L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + bits.length * 8)
    bb.putInt(numHashes).putInt(bits.length)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

object Bloom {
  /** sized for expectedItems at target fpp; capped so a single shard stays
    * executor-memory safe (shard count scales out instead). */
  def create(expectedItems: Long, fpp: Double, maxBits: Long = 1L << 33): Bloom = {
    val n = math.max(expectedItems, 1L)
    val m0 = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val m = math.min(math.max(m0, 64L), maxBits)
    val k = math.max(1, math.round(m.toDouble / n * math.log(2)).toInt)
    new Bloom(new Array[Long](((m + 63) / 64).toInt), math.min(k, 16))
  }

  def deserialize(bytes: Array[Byte]): Bloom = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val len = bb.getInt
    val bits = new Array[Long](len)
    var i = 0
    while (i < len) { bits(i) = bb.getLong; i += 1 }
    new Bloom(bits, k)
  }

  /** Bitwise-OR merge of equal-shape filters (associative, commutative). */
  def merge(a: Bloom, b: Bloom): Bloom = {
    require(a.bits.length == b.bits.length && a.numHashes == b.numHashes, "shape mismatch")
    val out = new Array[Long](a.bits.length)
    var i = 0
    while (i < out.length) { out(i) = a.bits(i) | b.bits(i); i += 1 }
    new Bloom(out, a.numHashes)
  }

  /** Single source of truth for the insert bit pattern — shared by
    * Bloom.put and BloomAggregator.reduce (whose buffer carries an extra
    * count slot and therefore cannot wrap itself in a Bloom). */
  def putInto(bits: Array[Long], numBits: Long, numHashes: Int, key: Long): Unit = {
    val h1 = mixStatic(key)
    val h2 = mixStatic(key ^ 0xdeadbeefcafe1234L) | 1L
    var i = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i * h2, numBits)
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  @inline def mixStatic(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** static hooks for codegen'd expressions (see BloomMightContain). */
  def mightContainSerialized(blob: Array[Byte], key: Long): Boolean =
    deserialize(blob).mightContain(key) // slow path; gate uses cached shards
}
