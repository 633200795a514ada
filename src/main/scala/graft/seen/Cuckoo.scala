package graft.seen

/** Compact deterministic cuckoo filter over 64-bit keys — the north rule's
  * second URL-seen shape ("partitioned Bloom/cuckoo-filter URL-seen set").
  * What it buys over [[Bloom]]: DELETION (a crawled url can be forgotten to
  * schedule a re-crawl without rebuilding the whole shard) and ~same fpp at
  * comparable space with better locality (2 bucket probes per lookup vs k
  * scattered bits).
  *
  * Design (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
  * CoNEXT'14 — public paper, from-scratch implementation):
  *  - 16-bit fingerprints (nonzero; 0 marks an empty slot), 4 slots/bucket;
  *  - partial-key cuckoo hashing: i2 = i1 XOR h(fp), so either bucket is
  *    recoverable from the other — deletion + displacement need only the
  *    fingerprint;
  *  - displacement order is DETERMINISTIC (slot rotation keyed by kick
  *    count), so shard contents are reproducible across runs — the same
  *    bit-stability contract the Bloom shards give (splitmix64 finalizer,
  *    JVM-independent).
  *
  * Sharding contract: like [[Bloom]] shards, one filter per salted key
  * bucket; inserts for a key always route to the shard that owns the key,
  * so cross-shard merge is never required (cuckoo filters do not merge by
  * OR — this is the structural difference from Bloom and why the shard
  * router, not the filter, is the distribution unit).
  *
  * No false negatives by construction (an inserted key's fingerprint is in
  * one of its two buckets until deleted) — property-tested in CuckooSpec.
  * Insert can fail only past ~95% load (maxKicks displacement chain); the
  * seen-set sizing keeps shards at ≤80% for headroom.
  */
final class Cuckoo(val table: Array[Short], val numBuckets: Int,
    val bucketSize: Int, val maxKicks: Int) extends Serializable {

  @inline private def mix(z: Long): Long = Bloom.mixStatic(z)

  @inline private def fingerprintOf(key: Long): Short = {
    // nonzero 16-bit fingerprint from an independent finalizer lane
    val f = (mix(key ^ 0x9e3779b97f4a7c15L) & 0xffffL).toInt
    (if (f == 0) 1 else f).toShort
  }

  @inline private def bucket1(key: Long): Int =
    java.lang.Long.remainderUnsigned(mix(key), numBuckets).toInt

  /** Partial-key alternate bucket. numBuckets is a power of two and the
    * fingerprint hash is MASKED to the bucket-index width, so the XOR is an
    * involution: altBucket(altBucket(i, fp), fp) == i — the property both
    * displacement and deletion rely on. */
  @inline private def altBucket(i: Int, fp: Short): Int =
    i ^ (mix(fp.toLong & 0xffffL) & (numBuckets - 1)).toInt

  @inline private def slot(b: Int, s: Int): Int = b * bucketSize + s

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < bucketSize) {
      if (table(slot(b, s)) == 0) { table(slot(b, s)) = fp; return true }
      s += 1
    }
    false
  }

  private def containsAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < bucketSize) {
      if (table(slot(b, s)) == fp) return true
      s += 1
    }
    false
  }

  /** Insert; false iff the displacement chain exhausted maxKicks (filter
    * effectively full — callers size shards to stay below that).
    * IDEMPOTENT: re-inserting a present fingerprint is a no-op (set
    * semantics, not counting) — so duplicate keys in a build stream cannot
    * overfill a shard or make the displacement chain unsatisfiable, and
    * [[delete]] fully removes a key however many times it was inserted. */
  def insert(key: Long): Boolean =
    insertFingerprint(bucket1(key), fingerprintOf(key))

  /** Fingerprint-level insert given one of its two home buckets — the
    * primitive shard MERGE needs: a stored (bucket, fp) pair from another
    * same-geometry filter reinserts here without the original key (both
    * homes are recoverable via the XOR involution). Idempotent: a
    * fingerprint already present in either home bucket is not duplicated
    * (membership-equivalent, and the only duplicate-tolerance contract the
    * seen-set builder can give — cross-partition duplicate keys meet here
    * during partial-buffer merge). */
  def insertFingerprint(i1: Int, fp0: Short): Boolean = {
    var fp = fp0
    val i2 = altBucket(i1, fp)
    if (containsAt(i1, fp) || containsAt(i2, fp)) return true
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) return true
    // displace: deterministic victim slot = kick count mod bucketSize
    var b = if ((mix(i1.toLong ^ (fp.toLong & 0xffffL)) & 1L) == 0L) i1 else i2
    var kicks = 0
    while (kicks < maxKicks) {
      val s = kicks % bucketSize
      val victim = table(slot(b, s))
      table(slot(b, s)) = fp
      fp = victim
      b = altBucket(b, fp)
      if (tryInsertAt(b, fp)) return true
      kicks += 1
    }
    false
  }

  /** Merge another same-geometry filter's contents into this one by
    * fingerprint reinsertion. Membership-preserving (every key queryable in
    * `other` stays queryable here); NOT byte-deterministic under reordering
    * — unlike Bloom's OR-merge — which is why the seen-gate treats
    * membership, not bytes, as the contract. False iff capacity overflowed. */
  def mergeFrom(other: Cuckoo): Boolean = {
    require(other.numBuckets == numBuckets && other.bucketSize == bucketSize,
      "cuckoo merge requires identical geometry")
    var i = 0
    while (i < other.table.length) {
      val fp = other.table(i)
      if (fp != 0 && !insertFingerprint(i / bucketSize, fp)) return false
      i += 1
    }
    true
  }

  def occupiedSlots: Long = {
    var n = 0L
    var i = 0
    while (i < table.length) { if (table(i) != 0) n += 1; i += 1 }
    n
  }

  def mightContain(key: Long): Boolean = {
    val fp = fingerprintOf(key)
    val i1 = bucket1(key)
    val i2 = altBucket(i1, fp)
    var s = 0
    while (s < bucketSize) {
      if (table(slot(i1, s)) == fp || table(slot(i2, s)) == fp) return true
      s += 1
    }
    false
  }

  /** Delete one copy of the key's fingerprint; false if absent.
    *
    * HAZARD under set-semantics inserts: two DISTINCT keys colliding on
    * (fingerprint, bucket pair) share ONE stored copy, so deleting either
    * key false-negatives the other (the cuckoo paper's delete is only
    * safe under counting semantics). The engine therefore never deletes
    * from a shared seen shard — [[CuckooSeen.forget]] REBUILDS the owning
    * shards from the authoritative membership instead. This low-level
    * method remains for single-writer filters whose callers can rule the
    * collision out (property-tested churn in BloomSpec models exactly
    * that: its Set model deletes only live keys it inserted). */
  def delete(key: Long): Boolean = {
    val fp = fingerprintOf(key)
    val i1 = bucket1(key)
    val i2 = altBucket(i1, fp)
    var s = 0
    while (s < bucketSize) {
      if (table(slot(i1, s)) == fp) { table(slot(i1, s)) = 0; return true }
      if (table(slot(i2, s)) == fp) { table(slot(i2, s)) = 0; return true }
      s += 1
    }
    false
  }

  def occupancy: Double = {
    var n = 0
    var i = 0
    while (i < table.length) { if (table(i) != 0) n += 1; i += 1 }
    n.toDouble / table.length
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + table.length * 2)
    bb.putInt(numBuckets).putInt(bucketSize).putInt(maxKicks)
    table.foreach(bb.putShort)
    bb.array()
  }
}

object Cuckoo {
  /** Size for expectedItems at ≤80% load (insert-failure headroom; fpp at
    * 16-bit fingerprints ≈ 2*bucketSize/2^16 ≈ 0.012%). */
  def create(expectedItems: Long, bucketSize: Int = 4, maxKicks: Int = 500): Cuckoo = {
    val slots = math.max(expectedItems, 16L) / 0.8
    var buckets = math.max(1L, (slots / bucketSize).toLong)
    // next power of two: makes the XOR bucket walk well-distributed
    buckets = java.lang.Long.highestOneBit(math.max(1L, buckets - 1)) << 1
    // fail loudly past the JVM array bound instead of silently wrapping the
    // Int product (expectedItems ≳1.7B): oversized shard requests must
    // re-shard, not mis-size
    val tableLen = Math.toIntExact(buckets * bucketSize)
    new Cuckoo(new Array[Short](tableLen), Math.toIntExact(buckets),
      bucketSize, maxKicks)
  }

  def deserialize(bytes: Array[Byte]): Cuckoo = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nb = bb.getInt
    val bs = bb.getInt
    val mk = bb.getInt
    val t = new Array[Short](nb * bs)
    var i = 0
    while (i < t.length) { t(i) = bb.getShort; i += 1 }
    new Cuckoo(t, nb, bs, mk)
  }
}
