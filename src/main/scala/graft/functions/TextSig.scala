package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Scalar kernels for the signature/similarity hot paths, called from
  * generated code (see the sibling Catalyst expressions).
  *
  * Why kernels: Spark's higher-order functions (`transform`, `aggregate`,
  * `zip_with`) are CodegenFallback — they evaluate INTERPRETED, per-element,
  * with boxed lambda dispatch. A 16-lane minhash over ~100 shingles costs
  * ~1600 interpreted closure calls per row; the 60-lane simhash fold costs
  * ~6000. These kernels do the same arithmetic in one tight JVM loop
  * (measured ~5-10× on the d2/d3 bench queries).
  *
  * Numeric parity contracts (load-bearing for the DuckDB oracles):
  *  - [[simhashFromHashes]]: per-bit ±1 counts are order-independent
  *    integer sums — bit-identical to the 60-lane Column fold;
  *  - [[dotFloat]]/[[dotLong]]/[[dotDouble]]: left-fold accumulation in
  *    element order with each element widened to double FIRST — the exact
  *    IEEE op sequence of `aggregate(zip_with(a, b, (x, y) => x.cast(D) *
  *    y.cast(D)), 0.0, _ + _)`, so d6/d7/d8 cosines hash-match unchanged;
  *  - [[minhashBuckets]] defines its own hash family (XXH64 over shingle
  *    bytes, lane index as seed; band bucket = XXH64 chain over the band's
  *    lanes). The d2 oracle is hash-agnostic brute force — recall 1.0 at
  *    test scale is re-verified against it, not assumed.
  */
object TextSig {

  /** Thread-local MD5 instance for the 60-bit cross-engine hash kernels —
    * MessageDigest.getInstance per call would dominate the digest itself. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The repo-standard cross-engine 60-bit md5-prefix hash, straight off
    * the digest bytes: the first 15 hex digits of md5(x) parsed base 16
    * equal the digest's first 60 bits, i.e. (first 8 bytes big-endian)
    * >>> 4 — value-identical to the former
    * `conv(substring(md5(x), 1, 15), 16, 10)` Column chain (locked by
    * TextOpsSpec) without materializing the 32-char hex string, the
    * substring, the base-conversion string or the decimal re-parse. */
  def md5Hash60(bytes: Array[Byte]): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(bytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** [[md5Hash60]] over every element of a token-string array in one
    * kernel call — the simhash token-lane derivation without the
    * per-element interpreted `transform` dispatch. Null tokens hash to
    * null (the old per-element Column chain's semantics). */
  def md5TokenHashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i))
        out(i) = md5Hash60(tokens.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Per-band LSH buckets of a shingle-string array:
    * lane_i = min over shingles of xxh64(bytes, seed=i);
    * bucket_b = xxh64 chain over lanes [b*rows, (b+1)*rows). Empty shingle
    * sets get MaxValue lanes (all empty docs collide harmlessly; the
    * verify stage scores them jaccard 0). */
  def minhashBuckets(shingles: ArrayData, numBands: Int, rowsPerBand: Int): ArrayData = {
    val numHashes = numBands * rowsPerBand
    val lanes = new Array[Long](numHashes)
    java.util.Arrays.fill(lanes, Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      if (!shingles.isNullAt(j)) {
        val s = shingles.getUTF8String(j)
        val base = s.getBaseObject
        val off = s.getBaseOffset
        val len = s.numBytes
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashUnsafeBytes(base, off, len, i)
          if (h < lanes(i)) lanes(i) = h
          i += 1
        }
      }
      j += 1
    }
    val buckets = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 0x1567L
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(lanes(b * rowsPerBand + r), acc)
        r += 1
      }
      buckets(b) = acc
      b += 1
    }
    new GenericArrayData(buckets)
  }

  /** Packed simhash from a token-hash array: bit b set iff the ±1 count of
    * bit b over the hashes is positive. Integer sums — order-independent,
    * bit-identical to the per-bit Column fold (d3 oracle parity). */
  def simhashFromHashes(hashes: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hashes.numElements()
    var j = 0
    while (j < n) {
      if (!hashes.isNullAt(j)) {
        val h = hashes.getLong(j)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** k-gram shingle strings from a token array — one kernel pass instead
    * of an interpreted `transform(sequence(...), i -> concat_ws(' ',
    * slice(toks, i+1, k)))`. String parity is exact: the join uses the
    * same UTF8String.concatWs the concat_ws expression calls. Fewer than
    * k tokens → empty array (the guarded-sequence semantics). */
  def shingles(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements() - (k - 1)
    if (n <= 0) return new GenericArrayData(new Array[AnyRef](0))
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(i + j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hyperplane component matrix for (planes × dims), memoized per shape:
    * comp(p, i) = (pmod(xxhash64(i, p, 0x9e37L), 2000000) / 1e6) - 1 with
    * Spark's EXACT multi-arg xxhash64 chaining (seed 42, left fold) — the
    * Column form recomputes every component per ROW; the kernel pays it
    * once per executor. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planeMatrix(planes: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((planes, dims), { _ =>
      Array.tabulate(planes, dims) { (p, i) =>
        var h = XXH64.hashInt(i, 42L)
        h = XXH64.hashInt(p, h)
        h = XXH64.hashLong(0x9e37L, h)
        val m = ((h % 2000000L) + 2000000L) % 2000000L
        (m.toDouble / 1000000.0) - 1.0
      }
    })

  /** Packed hyperplane sign signature — kernel twin of the
    * `zip_with`+`aggregate` Column form, bit-identical (same component
    * values, same left-fold double accumulation). isFloat selects the
    * element accessor (float embeddings vs quantized longs). */
  def hyperplaneSig(vec: ArrayData, planes: Int, isFloat: Boolean): Long = {
    val n = vec.numElements()
    val comp = planeMatrix(planes, n)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val row = comp(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getLong(i).toDouble
        acc += x * row(i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** argmin cluster over fixed centroids by squared L2 — kernel twin of
    * `array_min` over (dist, cid) structs: element-order (x-c)^2 left fold
    * per centroid, strict-less update ⇒ lowest cid wins ties, identical
    * doubles ⇒ identical assignment. */
  def nearestCluster(vec: ArrayData, cents: Array[Array[Double]], cids: Array[Int],
      isFloat: Boolean): Int = {
    val n = vec.numElements()
    var best = Double.PositiveInfinity
    var bestC = 0
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getLong(i).toDouble
        val d = x - cv(i)
        acc += d * d
        i += 1
      }
      // strict less ⇒ the earliest (lowest-cid, cents are cid-ascending)
      // centroid wins ties — the array_min struct tie-break
      if (acc < best) { best = acc; bestC = c }
      c += 1
    }
    cids(bestC) // cids may be sparse after a Lloyd step empties a cell
  }

  /** Dot-product kernels. IEEE-identical to `aggregate(zip_with(a, b,
    * (x,y) -> x*y), 0D, (s,v) -> s+v)` for EQUAL-LENGTH arrays (same
    * left-fold order, each element widened to double first). Ragged input
    * RAISES instead of silently truncating — the HOF form would null-pad
    * and return NULL, so a truncated sum would be a silent divergence;
    * embeddings of mixed dimensionality are a data bug upstream. */
  @inline private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: array length mismatch ($n vs ${b.numElements()}) — mixed-dimensionality embeddings")
    n
  }

  def dotFloat(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }

  def dotLong(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getLong(i).toDouble * b.getLong(i).toDouble; i += 1 }
    acc
  }

  def dotDouble(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def dotInt(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getInt(i).toDouble * b.getInt(i).toDouble; i += 1 }
    acc
  }

  /** Per-document repetition metrics (Gopher-style quality signals) in one
    * kernel pass: `[n_words, n_distinct_words, max_word_count, n_bigrams,
    * n_distinct_bigrams, max_bigram_count]`. All integers — ratios like
    * duplicate-word fraction or top-bigram coverage are derived downstream
    * from exact numerators/denominators, so the DuckDB oracle hash-matches
    * without float-division divergence.
    *
    * Tokenization parity contract: split on the single space character,
    * KEEPING empty tokens (leading/trailing/adjacent) — exactly DuckDB's
    * `string_split(text, ' ')`, including `'' → ['']` (n_words = 1 for an
    * empty document). A bigram is `words(i) + " " + words(i+1)`. */
  def repetitionStats(text: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val words = text.toString.split(" ", -1)
    def bump(m: java.util.HashMap[String, Integer], key: String): Int = {
      val prev = m.get(key)
      val c = if (prev == null) 1 else prev.intValue() + 1
      m.put(key, Integer.valueOf(c))
      c
    }
    val wc = new java.util.HashMap[String, Integer]()
    var maxW = 0
    var i = 0
    while (i < words.length) {
      val c = bump(wc, words(i))
      if (c > maxW) maxW = c
      i += 1
    }
    val nBi = math.max(words.length - 1, 0)
    val bc = new java.util.HashMap[String, Integer]()
    var maxB = 0
    i = 0
    while (i < nBi) {
      val c = bump(bc, words(i) + " " + words(i + 1))
      if (c > maxB) maxB = c
      i += 1
    }
    new GenericArrayData(Array[Long](
      words.length.toLong, wc.size.toLong, maxW.toLong,
      nBi.toLong, bc.size.toLong, maxB.toLong))
  }
}
