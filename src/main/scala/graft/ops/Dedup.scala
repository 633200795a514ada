package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  * All variants are shuffle-minimal and expressed over built-in
  * (codegen'd) functions; nothing collects to the driver.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id.
    * One shuffle on a 16-byte key; partial agg map-side. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(col(textCol).cast("binary")).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word k-shingles of a text column (lowercased), as an array column.
    * tokenize = codegen'd builtins; the k-gram construction is a kernel
    * expression (the `transform(sequence, i -> concat_ws(slice))` form is
    * CodegenFallback — interpreted per element). String content is exact
    * concat_ws parity; short docs get an empty shingle set. */
  def shingles(textCol: Column, k: Int): Column =
    graft.functions.graftfns.shingles(split(lower(trim(textCol)), "\\s+"), k)

  /** MinHash signature (numHashes values) of a shingle array. Each hash
    * family member h_i(x) = xxhash64(x, seed_i); min over shingles.
    * NOTE: higher-order-function form kept for reference/tests; the hot
    * path uses the [[graft.functions.TextSig.minhashBuckets]] kernel
    * (HOFs evaluate interpreted — CodegenFallback). */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleArr, s => xxhash64(s, lit(i))))
    }: _*)

  /** MinHash+LSH near-dup candidate pairs:
    * shingle → minhash(numBands*rowsPerBand) → band buckets → self-join
    * within bucket. Scale shape: the only shuffle is the groupBy on
    * (band, bucket-hash); candidate verification (exact jaccard) runs only
    * on bucket collisions. Returns (id_a, id_b, band) candidate pairs,
    * id_a < id_b, deduped across bands. */
  def minhashLshCandidates(
      df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, numBands: Int = 4, rowsPerBand: Int = 4,
      maxBucket: Int = 100000): DataFrame = {
    // signature + banding in ONE kernel pass (graft.functions.TextSig):
    // the transform/array_min HOF form is CodegenFallback — interpreted,
    // ~1600 closure dispatches per row at 16 lanes × ~100 shingles
    val banded = df
      .select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
      .select(col("id"),
        graft.functions.graftfns.minhashBuckets(col("sh"), numBands, rowsPerBand).as("bk"))
      .select(col("id"), posexplode(col("bk")).as(Seq("band", "bucket")))
    // degenerate-bucket bound (see simhashCandidates scaladoc): exact-dup
    // mass collapses via Dedup.exact BEFORE LSH; anything still oversized
    // is skipped rather than joined quadratically
    val bounded = boundBuckets(banded, maxBucket)
    val a = bounded.as("a")
    val b = bounded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("a.band").as("band"))
      .groupBy("id_a", "id_b").agg(min("band").as("first_band"))
  }

  /** Exact n-gram Jaccard similarity for given candidate pairs (the
    * verify stage after LSH). pairs: (id_a, id_b). Emits the exact integer
    * numerator/denominator alongside the double: thresholds should use
    * cross-multiplied integers (num*q >= den*p for p/q) — engine-exact,
    * no float boundary — which is how the d2 oracle compares. */
  def jaccardVerify(df: DataFrame, pairs: DataFrame, textCol: String,
      idCol: String, k: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), k)).as("sh"))
    pairs
      .join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard_num",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard_den",
        size(array_union(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard",
        // two empty shingle sets are NOT duplicates: jaccard 0, and the
        // guard keeps ANSI mode from throwing DIVIDE_BY_ZERO on 0/0
        when(col("jaccard_den") === 0, lit(0.0))
          .otherwise(col("jaccard_num").cast("double") / col("jaccard_den")))
      .drop("sh_a", "sh_b")
  }

  /** SimHash-64 of the token multiset: per bit b, sum ±1 weighted by token
    * hash bit, sign → bit. Expressed with built-ins only: for each bit, sum
    * over tokens of (2*bit(h)-1), then pack via bitwise ops in a reduce. */
  def simhash64(textCol: Column): Column =
    simhashFromHashes(transform(split(lower(trim(textCol)), "\\s+"), t => xxhash64(t)), 64)

  /** simhash from a token-hash array column. `bits` ≤ 64; fewer bits suit
    * token hashes narrower than a long (e.g. a 60-bit md5-prefix hash that
    * a SQL oracle can reproduce). One kernel pass
    * ([[graft.functions.TextSig.simhashFromHashes]]) — bit-identical to
    * the per-bit `aggregate` fold (order-independent integer counts) but
    * codegen'd instead of `bits`× interpreted HOF evaluations. */
  def simhashFromHashes(hashes: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 64)
    graft.functions.graftfns.simhashFromHashes(hashes, bits)
  }

  /** SimHash near-dup candidates: band the `bits`-wide simhash into
    * `numBands` slices (any band equal → candidate), verify by hamming
    * distance ≤ maxHamming. Structural recall guarantee (pigeonhole): when
    * maxHamming < numBands a true pair cannot differ in every band, so the
    * candidate set PROVABLY contains every pair within maxHamming — the
    * filtered output is exactly the all-pairs hamming ball, computed
    * without the quadratic join.
    *
    * `maxBucket` bounds the self-join: a degenerate bucket (e.g. millions
    * of identical or empty docs) would otherwise go quadratic — the classic
    * web-dedup failure. Buckets larger than the cap are SKIPPED; collapse
    * exact duplicates first ([[exact]]) so mass-duplicate content never
    * reaches this operator as a giant bucket. The cap check rides the same
    * (band, bucket) exchange the join needs — no extra shuffle.
    *
    * `tokenHash` defaults to xxhash64; pass e.g. a 60-bit md5-prefix hash
    * (with bits=60) when a cross-engine-reproducible signature is needed.
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
      maxHamming: Int = 3, numBands: Int = 8, bits: Int = 64,
      tokenHash: Column => Column = t => xxhash64(t),
      maxBucket: Int = 100000): DataFrame = {
    val withSig = df
      .select(col(idCol).as("id"),
        transform(split(lower(trim(col(textCol))), "\\s+"), tokenHash).as("h"))
      .select(col("id"), simhashFromHashes(col("h"), bits).as("sig"))
    hammingCandidates(withSig, "id", "sig", maxHamming, numBands, bits, maxBucket)
  }

  /** Banded hamming-ball self-join over ANY packed bit signature column —
    * the shared engine under simhash text near-dup and phash image
    * near-dup. Pigeonhole guarantee: maxHamming < numBands ⇒ the output is
    * EXACTLY all pairs within the hamming ball (no quadratic join, no
    * missed pairs). Input df must carry (idCol, sigCol); emits
    * (id_a, id_b, hamming) with id_a < id_b. */
  def hammingCandidates(df: DataFrame, idCol: String, sigCol: String,
      maxHamming: Int, numBands: Int, bits: Int = 64,
      maxBucket: Int = 100000): DataFrame = {
    val bandBits = (bits + numBands - 1) / numBands
    val bandCols = (0 until numBands).map { b =>
      val width = math.min(bandBits, bits - b * bandBits)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftright(col("__sig"), b * bandBits).bitwiseAND(mask).as("bucket"))
    }
    val base = df.select(col(idCol).as("id"), col(sigCol).as("__sig"))
    val banded = base.select(col("id"), col("__sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("__sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val bounded = boundBuckets(banded, maxBucket)
    val a = bounded.as("a")
    val b = bounded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.__sig").bitwiseXOR(col("b.__sig"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Drop rows of (…, band, bucket) whose bucket exceeds `maxBucket` rows.
    * The count window partitions by (band, bucket) — the SAME keys the
    * downstream self-join shuffles on, so the exchange is shared and the
    * bound costs no extra shuffle. */
  private[graft] def boundBuckets(banded: DataFrame, maxBucket: Int): DataFrame = {
    val w = Window.partitionBy(col("band"), col("bucket"))
    banded.withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") <= maxBucket)
      .drop("__bn")
  }

  /** Embedding cosine near-dup: normalized dot products above threshold,
    * restricted to LSH sign-buckets (random-hyperplane) so the self-join
    * never goes quadratic. */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8, maxBucket: Int = 100000): DataFrame = {
    val sigExpr = Similarity.hyperplaneSignature(col(vecCol), planes)
    val withSig = boundBuckets(
      emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        lit(0).as("band"), sigExpr.as("bucket")),
      maxBucket).drop("band")
    val a = withSig.as("a")
    val b = withSig.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
