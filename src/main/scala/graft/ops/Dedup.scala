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

  /** Cross-corpus line dedup (the C4/RefinedWeb boilerplate-removal step):
    * for every distinct line KEEP exactly the globally-first occurrence —
    * smallest (doc id, line number) — and mark every other occurrence
    * dropped. Returns the input rows plus a `keep` boolean; reassembly of
    * the surviving document text is the caller's per-doc aggregate (d14).
    *
    * Scale shape: the group key is `md5(line)` (16 bytes), not the line
    * text, so the shuffle carries fingerprints instead of page-sized
    * strings — the same trick as [[exact]]. (doc, line_no) packs into ONE
    * BIGINT so the argmin is a HashAggregate with map-side partials
    * (`min(struct(...))` plans as SortAggregate — see Scheduler). The
    * join back to the input reuses the aggregate's own exchange on the
    * fingerprint: two linear shuffles total, no window, no skew trap (a
    * boilerplate line duplicated a billion times is ONE reduce-side min).
    *
    * `lineNoBits` bounds line numbers per doc (packed = doc<<bits | line);
    * callers with >2^20-line documents raise it.
    *
    * NULL lines (a failed extraction) keep: SQL's null ≠ null means a
    * missing line is never a duplicate OF anything, and the left join +
    * coalesce below returns those rows with `keep = true` instead of
    * silently dropping them through the hash join's null key (an inner
    * join on md5(NULL) = NULL would make the row vanish and the caller's
    * reassembly under-count vs its input). */
  def lineVerdicts(lines: DataFrame, docCol: String, lineNoCol: String,
      lineCol: String, lineNoBits: Int = 20): DataFrame = {
    require(lineNoBits > 0 && lineNoBits < 44, s"lineNoBits out of range: $lineNoBits")
    val packed = (col(docCol).cast("long") * (1L << lineNoBits)) +
      col(lineNoCol).cast("long")
    val hashed = lines.withColumn("__h", md5(col(lineCol).cast("binary")))
    val first = hashed.groupBy(col("__h")).agg(min(packed).as("__first"))
    hashed.join(first, Seq("__h"), "left")
      .withColumn("keep", coalesce(packed === col("__first"), lit(true)))
      .drop("__h", "__first")
  }

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

  /** Asymmetric shingle-CONTAINMENT detection — the quote/boilerplate leg
    * that symmetric resemblance misses: a short doc pasted inside a long
    * one has low Jaccard (the union grows with the long side) but
    * containment |A∩B|/|A| ≈ 1. The C4/RefinedWeb-style "is this page
    * mostly a quote of another page" pass.
    *
    * Plan shape: distinct shingles explode to (id, xxhash64(shingle)) —
    * 8-byte hashes travel through the shuffle, never shingle strings —
    * then a document-frequency cap drops shingles appearing in > maxDf
    * docs (each would contribute df² pair rows; web boilerplate is
    * exactly this mass). The hot list is O(total shingle rows / maxDf)
    * and anti-joins in (AQE broadcasts it while it fits); the surviving
    * self-join shuffles ONCE on the hash and the per-pair count
    * aggregates with map-side partials. Denominators are the PRE-cap
    * distinct-shingle counts, so capping only under-counts numerators —
    * conservative, never a false positive. Verdicts compare
    * cross-multiplied integers (shared·den ≥ num·|side|): engine-exact,
    * no float boundary, which is how the d16 oracle compares. A hash
    * collision could overcount `shared` by 1; at 2⁻⁶⁴ per shingle pair
    * that is the same accepted risk as every xxhash64 key in the engine.
    *
    * Emits unordered pairs (id_a < id_b) with both direction verdicts
    * (`a_in_b`: A is ≥ num/den contained in B; `b_in_a` likewise); only
    * pairs where at least one holds survive. */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3, maxDf: Int = 100,
      thresholdNum: Int = 4, thresholdDen: Int = 5,
      register: org.apache.spark.sql.Dataset[_] => Unit = _ => ()): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
        array_distinct(shingles(col(textCol), k)).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        explode(col("sh")).as("s"))
      .select(col("id"), col("n_sh"), xxhash64(col("s")).as("h"))
      // three consumers (the hot-list aggregate and both sides of the
      // self-join) — persist or the shingle explode + hash re-runs over
      // the corpus for each (Catalyst does no common-subplan elimination;
      // same measured rationale as t10's cached tf projection). The
      // persist is handed to `register` (the CuckooSeen/BandStore release
      // contract): the result is LAZY, so the operator cannot unpersist
      // it itself — callers unpersist after consuming, or the cached
      // blocks live for the session
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(sh)
    val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("h")
    val kept = sh.join(hot, Seq("h"), "left_anti")
    val a = kept.as("a")
    val b = kept.as("b")
    a.join(b, col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared"),
        first(col("a.n_sh")).as("n_a"), first(col("b.n_sh")).as("n_b"))
      .withColumn("a_in_b",
        col("shared") * thresholdDen >= lit(thresholdNum) * col("n_a"))
      .withColumn("b_in_a",
        col("shared") * thresholdDen >= lit(thresholdNum) * col("n_b"))
      .filter(col("a_in_b") || col("b_in_a"))
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
    val banded = bandRows(df, idCol, sigCol, numBands, bits)
    val bounded = boundBuckets(banded, maxBucket)
    val a = bounded.as("a")
    val b = bounded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.__sig").bitwiseXOR(col("b.__sig"))).as("hamming"))
      // filter BEFORE the distinct: hamming is deterministic per pair, so
      // pairs beyond the ball never enter the pair-dedup shuffle
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Band a packed `bits`-wide signature into `numBands` contiguous bit
    * slices: one row per (row, band) as (id, __sig, band, bucket) — the
    * shared derivation under [[hammingCandidates]]'s self-join and
    * [[BandStore]]'s persistent index (both MUST band identically or a
    * store probe looks in the wrong buckets). Row-local, codegen'd. */
  private[graft] def bandRows(df: DataFrame, idCol: String, sigCol: String,
      numBands: Int, bits: Int): DataFrame = {
    val bandBits = (bits + numBands - 1) / numBands
    val bandCols = (0 until numBands).map { b =>
      val width = math.min(bandBits, bits - b * bandBits)
      val mask = if (width >= 64) -1L else (1L << width) - 1
      struct(lit(b).as("band"),
        shiftright(col("__sig"), b * bandBits).bitwiseAND(mask).as("bucket"))
    }
    df.select(col(idCol).as("id"), col(sigCol).as("__sig"))
      .select(col("id"), col("__sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("__sig"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
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

  /** Connected components over near-dup PAIRS — the transitive-closure
    * stage every production MinHash pipeline runs after pair verification:
    * A~B and B~C must collapse to ONE survivor even when A and C never
    * share a bucket. Alternating large-star / small-star (the MapReduce CC
    * algorithm of Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): converges in O(log² n) rounds REGARDLESS of component
    * diameter (plain min-label propagation needs O(diameter) rounds — a
    * chain of boilerplate-near-dup pages can be arbitrarily long), each
    * round is two self-shuffles of the EDGE set only (O(pairs), not
    * O(corpus)), no driver-side union-find, nothing collected.
    *
    * Input: (id_a, id_b) candidate/verified pairs (any extra columns
    * ignored). Output: one row per node that appears in any non-self pair
    * — (doc_id, component_rep) with component_rep = min(id) of the
    * connected component (mirroring [[exact]]'s min-id survivor rule).
    *
    * Convergence detection: a round that leaves the edge multiset's
    * (count, xxhash64-sum) unchanged is a fixed point — and the only
    * fixed points of the composed round are min-rooted star forests.
    * Throws after `maxIter` rounds rather than returning an unconverged
    * (wrong) labelling; the O(log² n) bound makes the default
    * unreachable for any real pair set.
    *
    * The ITERATION ENGINE is chosen per call from the measured canonical
    * edge count (`graft.cc.datasetThreshold`, default 500k — the measured
    * crossover on local[32]); neither engine wins everywhere:
    *  - BELOW the threshold it runs on `RDD[(Long, Long)]` — the one
    *    deliberate RDD use in the engine. The round's plan SHAPE never
    *    changes, only its leaf data, yet re-deriving it as Datasets pays
    *    ~2–2.7 s of DRIVER-side Catalyst analysis + whole-stage-codegen
    *    compilation per round against well under 0.1 s of execution at
    *    query scale (profiled; it is also why GraphX iterates on RDDs);
    *    the RDD closures compile once per JVM → ~0.4 s/round.
    *  - ABOVE it the SAME rounds run as DataFrames: RDD tuple ops move
    *    boxed Tuple2s through Java-serialized shuffles at ~0.5M rows/s
    *    per thread (measured; Kryo indistinguishable), while Tungsten
    *    executes the identical round ~11× faster at 1.2M edges, and the
    *    compile floor amortizes to nothing at 10^10 pairs — where
    *    columnar execution plus AQE re-planning each round's shuffle
    *    width as the edge set shrinks is exactly the cluster posture.
    * Edge derivation (in) and labelling (out) stay Catalyst either way.
    * In the RDD loop all shuffles share ONE HashPartitioner sized from
    * the edge count (~50k edges/partition — small enough that compute,
    * not scheduling, fills each task), so each star's min-side join is
    * co-partitioned — no extra exchange. Lineage is truncated every
    * round (reliable `checkpoint` when the session has a checkpoint dir
    * — the cluster posture, survives executor loss — else
    * `localCheckpoint`), keeping recovery DAGs bounded; superseded
    * rounds' blocks are reclaimed by the ContextCleaner. */
  def connectedComponents(
      pairs: DataFrame,
      maxIter: Int = 50): DataFrame = connectedComponentsWithRounds(pairs, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds the closure
    * took — observability for the O(log² n) bound (bench `cc_scale`). */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame,
      maxIter: Int = 50): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    def truncatedDf(df: DataFrame): DataFrame = IterSupport.truncateDf(df, reliable)

    // canonical undirected edges u < v; self-pairs and null ids dropped;
    // checkpointed so BOTH engines start from materialized blocks and the
    // engine-picking count below is not a wasted scan
    val init = truncatedDf(pairs
      .filter(col("id_a").isNotNull && col("id_b").isNotNull && col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).cast("long").as("u"),
        greatest(col("id_a"), col("id_b")).cast("long").as("v"))
      .distinct())
    // ONE job materializes the checkpoint, counts for engine dispatch, AND
    // doubles as the Dataset loop's initial convergence checksum
    val initSig = dfChecksum(init)
    val edgeCount = initSig._1
    val threshold = spark.conf.getOption("graft.cc.datasetThreshold")
      .map(_.toLong).getOrElse(500000L)
    val (edges, rounds) =
      if (edgeCount == 0L) (init, 0)
      else if (edgeCount <= threshold) ccRddLoop(init, edgeCount, maxIter, reliable)
      else ccDatasetLoop(init, initSig, maxIter, truncatedDf)

    // converged edges are min-rooted stars: children labelled by root,
    // plus one row per root labelling itself
    val labels = edges.select(col("v").as("doc_id"), col("u").as("component_rep"))
      .unionByName(
        edges.select(col("u").as("doc_id"), col("u").as("component_rep")).distinct())
    (labels, rounds)
  }

  /** The small-graph engine: star rounds on `RDD[(Long, Long)]`. The RDD
    * closures compile once per JVM, so a round costs only its shuffles
    * (~0.4 s at query scale vs ~2.5 s of per-round Catalyst replanning for
    * the identically-shaped Dataset plan — it is also why GraphX iterates
    * on RDDs). All shuffles share ONE HashPartitioner, so each star's
    * min-side join is co-partitioned — no extra exchange. */
  private def ccRddLoop(init: DataFrame, edgeCount: Long, maxIter: Int,
      reliable: Boolean): (DataFrame, Int) = {
    val spark = init.sparkSession
    import spark.implicits._
    val initRdd = init.as[(Long, Long)].rdd

    // shuffle width from the MEASURED edge count + per-round lineage
    // truncation — the rules shared with the LinkGraph loops, one
    // definition in [[IterSupport]] (RDD tuple ops process ~0.5M
    // rows/s/thread measured, so partitions are kept small enough that
    // compute, not scheduling, fills each task)
    val part = IterSupport.sharedPartitioner(spark, edgeCount, initRdd.getNumPartitions)
    def truncated(e: org.apache.spark.rdd.RDD[(Long, Long)]) =
      IterSupport.truncateRdd(e, reliable) // materializes in the checksum action

    // large-star: every node attaches its STRICTLY LARGER neighbors to
    // the minimum of its closed neighborhood. ONE shuffle (groupByKey of
    // the neighbor multiset) + the emission narrow — the former
    // reduceByKey-mins + partitionBy.join shape shuffled the same
    // multiset PLUS a combined mins table and ran a third stage for the
    // join; grouping is safe here because this engine only runs below
    // `graft.cc.datasetThreshold` edges (≤500k), so a neighbor list is
    // bounded by that. Emission is identical: m = min(closed nbhd),
    // emit (m, v) per strictly-larger neighbor v.
    //
    // NO mid-round distinct: different groups can emit the same (m, v)
    // pair (two low nodes sharing both the min and a larger neighbor),
    // but small-star is duplicate-tolerant — duplicate `us` entries do
    // not move a group min, and every emission passes through its
    // trailing distinct, which is what defines the round's canonical
    // output (and feeds the convergence checksum). Dropping the distinct
    // removes one of the round's three shuffles outright (guide §2.4) at
    // the cost of duplicate rows riding the small-star exchange — at most
    // one per same-(min, neighbor) group pair, bounded by the edge count
    // this engine caps at.
    def largeStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      e.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
        .groupByKey(part)
        .flatMap { case (u, vs) =>
          var mn = u
          val it0 = vs.iterator
          while (it0.hasNext) { val v = it0.next(); if (v < mn) mn = v }
          val m = mn
          vs.iterator.collect { case v if v > u => (m, v) }
        }
    }

    // small-star: every node attaches its smaller neighbors AND itself to
    // the minimum of that set. Edges arrive canonical (u < v), so "bigger
    // node's smaller neighbors" = key by v. Same one-shuffle groupByKey
    // shape as largeStar.
    def smallStar(e: org.apache.spark.rdd.RDD[(Long, Long)]) = {
      e.map { case (u, v) => (v, u) }
        .groupByKey(part)
        .flatMap { case (v, us) =>
          var mn = Long.MaxValue
          val it0 = us.iterator
          while (it0.hasNext) { val u = it0.next(); if (u < mn) mn = u }
          val m = mn
          us.iterator.collect { case u if u != m => (m, u) } ++ Iterator((m, v))
        }
        .distinct(part.numPartitions)
    }

    // multiset identity probe: count + order-independent hash sum (mix64
    // pair hash; wrapping Long addition is commutative). Equal across a
    // round ⇒ fixed point (collision odds ~2⁻⁶⁴, and the round bound
    // below still backstops).
    def checksum(e: org.apache.spark.rdd.RDD[(Long, Long)]): (Long, Long) =
      e.map { case (u, v) =>
        (1L, graft.imagecodec.ImageCodec.mix64(
          u * 0x9E3779B97F4A7C15L ^ graft.imagecodec.ImageCodec.mix64(v)))
      }.fold((0L, 0L)) { case ((c1, h1), (c2, h2)) => (c1 + c2, h1 + h2) }

    // init is already materialized by the dispatcher's count; coalesce
    // narrow if the loop width is below the input's
    var edges = initRdd
    if (part.numPartitions < edges.getNumPartitions)
      edges = edges.coalesce(part.numPartitions) // narrow, no shuffle
    var sig = checksum(edges)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxIter) {
      val next = truncated(smallStar(largeStar(edges)))
      val nextSig = checksum(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "pair graph far beyond the O(log² n) bound; raise maxIter")
    (edges.toDF("u", "v"), rounds)
  }

  /** The large-graph engine: the same star rounds as DataFrames. Tungsten
    * hash aggregation + codegen move edges ~11× faster than the RDD loop's
    * boxed-Tuple2, Java-serialized shuffles (measured at 1.2M edges: 2.6
    * vs 30 s/round single-threaded), and the ~2 s/round driver-side
    * Catalyst replanning that dominates small closures amortizes to
    * nothing here. Per-round shuffle widths follow the session's
    * shuffle-partition/AQE settings — the cluster posture at 10^10 pairs,
    * where AQE also re-plans each round's width as the edge set shrinks. */
  /** Multiset identity probe shared by the dispatcher and the Dataset
    * loop: count + order-independent hash sum. The sum runs in
    * DECIMAL(38,0): ANSI mode (Spark 4 default) throws on the long
    * overflow a sum of random 64-bit hashes is guaranteed to hit. */
  private def dfChecksum(e: DataFrame): (Long, java.math.BigDecimal) = {
    val r = e.agg(count(lit(1)),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head()
    (r.getLong(0), r.getDecimal(1))
  }

  private def ccDatasetLoop(init: DataFrame,
      initSig: (Long, java.math.BigDecimal), maxIter: Int,
      truncatedDf: DataFrame => DataFrame): (DataFrame, Int) = {
    // Stars as WINDOW aggregates, not groupBy + join back: the join form
    // pays THREE exchanges per star (the agg's partial-row exchange, the
    // join side's full-row exchange — no reuse, the subtrees differ — and
    // the trailing distinct), the window form TWO (one hash exchange on
    // the star key feeds a sort + running min over the whole group, then
    // the distinct). Emission predicates and output sets are identical
    // per row; the per-group min is the same value attached without
    // moving the edge multiset a second time (guide §2.4 "two operations
    // keyed the same way can share one exchange"). A giant star's group
    // sorts in one task either way (the join co-locates the same key);
    // WindowExec spills via its row buffer. Measured at 720k edges /
    // local[32]: 43.3 → 33.9 s warm for the full closure (11 rounds).
    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val w = Window.partitionBy(col("u"))
      nbrs
        .withColumn("__m", least(col("u"), min(col("v")).over(w)))
        .filter(col("v") > col("u"))
        .select(col("__m").as("u"), col("v")) // m ≤ old u < v keeps u < v canonical
        .distinct()
      // (measured: dropping this distinct and letting small-star's
      // duplicate-blind aggregates absorb the multiset is NEUTRAL at 1.2M
      // edges — the duplicate inflation through small-star costs what the
      // saved exchange gains — so both engines keep the same
      // canonical-multiset-per-star invariant)
    }
    def smallStar(e: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("v"))
      val withM = e.withColumn("__m", min(col("u")).over(w))
      val leaves = withM.filter(col("u") =!= col("__m"))
        .select(col("__m").as("u"), col("u").as("v"))
      // one (m, v) row per input row of the group — the trailing distinct
      // collapses them to the join form's one-per-group center row
      val centers = withM.select(col("__m").as("u"), col("v"))
      leaves.union(centers).distinct()
    }
    var edges = init
    var sig = initSig
    var converged = false
    var rounds = 0
    // (measured: running these rounds with AQE disabled is ~1.5× SLOWER
    // at 1.2M edges — AQE's stage re-optimization coalesces the shrinking
    // edge set's shuffles into proportionally fewer tasks, which beats
    // the saved driver re-planning; keep the session setting)
    while (!converged && rounds < maxIter) {
      val t0 = System.nanoTime
      val next = truncatedDf(smallStar(largeStar(edges))) // materializes in dfChecksum()
      val nextSig = dfChecksum(next)
      converged = nextSig == sig
      edges = next
      sig = nextSig
      rounds += 1
      if (sys.env.get("GRAFT_CC_TRACE").contains("1"))
        println(f"[cc] round $rounds: ${(System.nanoTime - t0) / 1e9}%.2f s, edges=${nextSig._1}")
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "pair graph far beyond the O(log² n) bound; raise maxIter")
    (edges, rounds)
  }

  /** Incrementally fold NEW near-dup pairs into an existing component
    * labelling — the cluster-label leg of the engine's incremental-
    * maintenance story (seen-set: CuckooSeen.insert; ANN: Ivf
    * .appendToIndex; band index: BandStore.append; THIS: the labels a
    * crawl batch's [[BandStore.ingest]] pairs must update). Re-closing
    * the full historical pair multiset per batch is O(all pairs ever);
    * here the closure runs ONLY over the components the batch touches:
    * a new pair can merge or relabel a stored component only if one of
    * its endpoints is in it, so every other label passes through
    * verbatim, and the touched components enter as their STAR edges
    * (component_rep → doc_id — spanning exactly the same components,
    * rooted at each component's min). The iteration is therefore
    * O(touched-component members + new pairs) — at a 10^10-node
    * labelling a crawl batch touches a vanishing fraction of clusters,
    * and the rest costs two linear scans of the label table (the
    * semi/anti split against the broadcast-sized touched-rep list),
    * never a closure round. Depth-1 stars converge in a couple of
    * rounds unless the batch genuinely chains many old clusters.
    *
    * Like [[connectedComponents]]' engine choice, the update SHAPE is
    * dispatched per call on the labelling's measured size: a labelling
    * below `graft.cc.touchedSplitThreshold` re-enters the closure whole
    * (full-star) — at that size the split's bookkeeping jobs cost more
    * than the smaller closure saves (numbers at the dispatch site).
    *
    * Equivalence (asserted by `d13_cc_update`'s oracle and OpsSpec,
    * incl. the union-find property test): updateComponents(
    * connectedComponents(P1), P2) produces the same labelling as
    * connectedComponents(P1 ∪ P2) — star edges preserve connectivity,
    * each root is already its component's min, so the merged minimum is
    * the true minimum over the union, and untouched components cannot
    * change reps without a new edge. Like [[connectedComponents]], the
    * output covers nodes that appear in at least one edge (a labelling
    * row IS an edge), each labelled with its component's min id.
    *
    * Lifecycle contract: `newPairs` is consumed ENTIRELY during this
    * call (the closure is eager and the touched-rep set is
    * checkpointed below) — callers may release a persisted pair
    * derivation as soon as the call returns. `labels`, by contrast, is
    * re-scanned lazily by the untouched pass-through at every
    * downstream action, which is the 10^10 shape (the label table
    * lives in a store and the update's one write scans it once) — so
    * `labels` must stay cheap to re-read (store-backed or
    * checkpointed, as this engine's own outputs are). */
  def updateComponents(labels: DataFrame, newPairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val spark = labels.sparkSession
    val pairs = newPairs.select(col("id_a"), col("id_b"))
    // Like the closure's engine dispatch, the update SHAPE is picked per
    // call from a measured size: below the threshold the whole (tiny)
    // labelling re-enters the closure as star edges — the touched-split's
    // extra jobs (rep checkpoint, semi/anti scans, deeper final plan)
    // cost ~1 s that a small closure doesn't give back. The size probe is
    // limit(t+1).count(): CollectLimit reads only until t+1 rows exist,
    // so probing a 10^10-row labelling costs one partition read, not a
    // scan. (full vs split, measured warm on local[32], components of 10,
    // 4k-pair batch: 50k labels 3.0 vs 3.5 s; 200k 3.4 vs 3.0; 1M 7.2 vs
    // 3.4; 4M 13.6 vs 3.6 — and at the d13/e3 regime of <10k labels full
    // wins by ~2 s. Default 100k, conf `graft.cc.touchedSplitThreshold`.)
    val splitThreshold = spark.conf.getOption("graft.cc.touchedSplitThreshold")
      .map(_.toLong).getOrElse(100000L)
    // a LOCAL labelling (the empty frame a maintenance loop starts from,
    // or a collected bootstrap) answers the size probe from its analyzed
    // plan — no job; everything else pays the one-partition CollectLimit
    // probe as before
    val localSize = labels.queryExecution.analyzed match {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation =>
        Some(l.data.size.toLong)
      case _ => None
    }
    val small = splitThreshold >= Int.MaxValue.toLong ||
      (splitThreshold > 0 && localSize.map(_ <= splitThreshold).getOrElse(
        labels.limit(splitThreshold.toInt + 1).count() <= splitThreshold))
    if (small) {
      // full-star shape: every labelled node re-enters as a star edge;
      // the closure is eager, so the result references neither input
      val starEdges = labels
        .filter(col("doc_id") =!= col("component_rep"))
        .select(col("component_rep").as("id_a"), col("doc_id").as("id_b"))
      connectedComponents(starEdges.unionByName(pairs), maxIter)
    } else {
      val batchNodes = pairs.select(col("id_a").as("doc_id"))
        .unionByName(pairs.select(col("id_b").as("doc_id")))
        .distinct()
      // reps of every component adjacent to the batch — O(batch) rows, so
      // AQE broadcasts both the semi and the anti side below. Materialized
      // EAGERLY so the returned labelling holds NO reference to newPairs:
      // the anti join re-executes at every downstream action, and a lazy
      // rep set would re-derive the batch's pairs (LSH probe + verify —
      // the expensive stage) each time, after the caller already released
      // its persist of them.
      // NON-EAGER checkpoint: the closure below consumes touchedStars —
      // which reads this frame — and the closure is eager, so the
      // checkpoint is guaranteed materialized before the call returns
      // (the release contract) WITHOUT its own materialization job; the
      // former eager form paid one extra job + plan wait per fold
      val touchedRepsLazy = labels.join(batchNodes, Seq("doc_id"), "left_semi")
        .select(col("component_rep")).distinct()
      val touchedReps =
        if (spark.sparkContext.getCheckpointDir.isDefined)
          touchedRepsLazy.checkpoint(eager = false)
        else touchedRepsLazy.localCheckpoint(eager = false)
      val untouched = labels.join(touchedReps, Seq("component_rep"), "left_anti")
      // touched components re-enter the closure as star edges; roots ride
      // their children's edges, and a SINGLETON labelling row (doc_id ==
      // component_rep with no children) cannot occur in a labelling this
      // engine produced (every root has ≥1 child)
      val touchedStars = labels.join(touchedReps, Seq("component_rep"), "left_semi")
        .filter(col("doc_id") =!= col("component_rep"))
        .select(col("component_rep").as("id_a"), col("doc_id").as("id_b"))
      connectedComponents(touchedStars.unionByName(pairs), maxIter)
        .unionByName(untouched.select(col("doc_id"), col("component_rep")))
    }
  }

  /** Deletion-aware component maintenance — the right-to-be-forgotten
    * leg that [[updateComponents]] cannot cover: removing a node can
    * SPLIT its component (the deleted doc may be the only bridge), so
    * the stored star edges are NOT a safe substitute for the truth.
    * Touched components — those holding a deleted member — re-close
    * from their SURVIVING true pairs; every other label row passes
    * through untouched. Cost is O(touched members + their pairs), not
    * O(corpus): at 10^10 labels a takedown batch touches a vanishing
    * fraction of components, and both the semi and anti side of the
    * pass-through ride one eagerly-materialized rep set (same contract
    * as [[updateComponents]]' split shape — a lazy rep set would
    * re-derive the deletion batch at every downstream action).
    *
    * `pairs` is the VERIFIED pair set (the band store's accumulated
    * truth, id_a/id_b); it is consumed entirely during this call (the
    * re-closure is eager), so callers may release a persisted pair
    * derivation at return. Touched members that lose every pair come
    * back as singleton self-reps — they are still corpus members,
    * only no longer duplicates of anything.
    *
    * Mirrors `CuckooSeen.forget`'s rebuild-owning-shards-from-truth
    * design (reference semantics: a removed record must not leave
    * phantom links, `/root/reference` has no incremental path at all —
    * it reprocesses the dump). */
  def forgetComponents(
      labels: DataFrame, // (doc_id, component_rep) — stored labelling
      pairs: DataFrame, // (id_a, id_b) — verified pair truth
      deleted: DataFrame, // (doc_id) — ids to forget
      maxIter: Int = 50): DataFrame = {
    val spark = labels.sparkSession
    val del = deleted.select(col("doc_id")).distinct()
    // NON-EAGER checkpoints (cf. updateComponents' split path): the
    // re-closure below is eager and reads members — which reads
    // touchedReps — so both frames are materialized during this call by
    // the closure's own first action instead of by two dedicated
    // materialization jobs. Neither frame's lineage touches `pairs`
    // (labels ⋉ del only), so the caller's release-at-return contract
    // for a persisted pair derivation is unaffected; both stay
    // checkpoint-backed for the lazy pass-through/singleton reads.
    val touchedRepsLazy = labels.join(del, Seq("doc_id"), "left_semi")
      .select(col("component_rep")).distinct()
    val touchedReps =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        touchedRepsLazy.checkpoint(eager = false)
      else touchedRepsLazy.localCheckpoint(eager = false)
    val untouched = labels.join(touchedReps, Seq("component_rep"), "left_anti")
      .select(col("doc_id"), col("component_rep"))
    val membersLazy = labels.join(touchedReps, Seq("component_rep"), "left_semi")
      .join(del, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
    val members =
      if (spark.sparkContext.getCheckpointDir.isDefined)
        membersLazy.checkpoint(eager = false)
      else membersLazy.localCheckpoint(eager = false)
    // true pairs with BOTH endpoints surviving inside a touched component
    // (a pair between two untouched components has no member endpoint and
    // drops here — its labels already passed through)
    val survivingPairs = pairs
      .join(members.withColumnRenamed("doc_id", "id_a"), Seq("id_a"), "left_semi")
      .join(members.withColumnRenamed("doc_id", "id_b"), Seq("id_b"), "left_semi")
      .select(col("id_a"), col("id_b"))
    val reclosed = connectedComponents(survivingPairs, maxIter)
    val singletons = members.join(reclosed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("component_rep"))
    reclosed.unionByName(untouched).unionByName(singletons)
  }

  /** One survivor per duplicate cluster: collapse `docs` by the connected
    * components of `pairs`, keeping the min-id row of each component (and
    * every row that appears in no pair). The anti-join's right side is the
    * non-survivor id list — O(duplicate rows), far smaller than the
    * corpus, so AQE broadcasts it when it fits and falls back to a
    * shuffled anti join when a 100 TB crawl's dup set does not. */
  def collapseNearDups(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val losers = connectedComponents(pairs, maxIter)
      .filter(col("doc_id") =!= col("component_rep"))
      .select(col("doc_id").as("__loser_id"))
    docs.join(losers, docs(idCol) === col("__loser_id"), "left_anti")
  }

  /** Cross-corpus duplicated-SPAN scrub — the Gopher/RefinedWeb exact
    * substring-dedup pass the document-level detectors above cannot
    * express: any k-gram that occurs in ≥ 2 DISTINCT documents is a
    * duplicated span, and every token it covers is removed from every
    * document that carries it (production runs this with k≈50 over
    * token ids; the semantics are identical). Emits one row per input
    * doc: `(doc_id, n_tokens, n_scrubbed, scrubbed_md5)` where
    * `scrubbed_md5` hashes the surviving tokens re-joined in order —
    * so an oracle check proves position bookkeeping, not just counts.
    *
    * Scale shape: the k-gram stream is `posexplode` over the codegen'd
    * [[graft.functions.graftfns.shingles]] kernel (linear, row-local);
    * the duplicated-gram set is ONE hash aggregate keyed on the 60-bit
    * cross-engine md5 prefix (8-byte shuffle key, never the gram text —
    * same trick as [[exact]]), with `countDistinct(doc)` planned as the
    * two-phase partial-distinct aggregate; cover positions ride a
    * left-semi join back on that same key and collapse per doc through
    * `collect_set` (bounded by document length, not corpus size). The
    * final token filter is a row-local lambda over the doc's own token
    * array. No window, no quadratic self-join; a boilerplate span
    * duplicated a billion times is one reduce-side group. */
  /** Shared prelude of [[spanScrub]]/[[scrubbedText]]: one row per input
    * doc with its token array and the set of positions covered by ≥ 1
    * cross-doc duplicated k-gram (`cov`, null when nothing matched). */
  private def spanCover(df: DataFrame, textCol: String, idCol: String, k: Int,
      register: org.apache.spark.sql.Dataset[_] => Unit): DataFrame = {
    require(k >= 2, s"span width must be >= 2: $k")
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val base = df.select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
    val ngrams = base
      .select(col("doc_id"),
        posexplode(graft.functions.graftfns.shingles(col("toks"), k)).as(Seq("p", "ng")))
      .select(col("doc_id"), col("p"), CrossHash.md5Hash60(col("ng")).as("ngh"))
      // two consumers (the dup-set aggregate and the semi-join left side)
      // — persist or the tokenize + shingle + hash pass re-runs over the
      // corpus for each (the t10 cached-tf rationale). Handed to
      // `register` for caller-managed release (see containmentPairs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(ngrams)
    val dup = ngrams.groupBy("ngh")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= 2)
      .select("ngh")
    val cover = ngrams.join(dup, Seq("ngh"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + (k - 1))).as("pos"))
      .groupBy("doc_id").agg(collect_set(col("pos")).as("cov"))
    base.join(cover, Seq("doc_id"), "left")
  }

  /** The surviving-token array of a covered doc — row-local. */
  private def survivingToks =
    filter(col("toks"), (t, i) => !coalesce(array_contains(col("cov"), i), lit(false)))

  def spanScrub(df: DataFrame, textCol: String, idCol: String, k: Int,
      register: org.apache.spark.sql.Dataset[_] => Unit = _ => ()): DataFrame =
    spanCover(df, textCol, idCol, k, register)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("n_scrubbed"),
        md5(array_join(survivingToks, " ").cast("binary")).as("scrubbed_md5"))

  /** [[spanScrub]]'s surviving text itself, for compositions that keep
    * processing the cleaned corpus (e.g. quality-filter then sample):
    * one row per input doc, `(doc_id, text)` with the surviving tokens
    * re-joined in order (possibly empty). */
  def scrubbedText(df: DataFrame, textCol: String, idCol: String, k: Int,
      register: org.apache.spark.sql.Dataset[_] => Unit = _ => ()): DataFrame =
    spanCover(df, textCol, idCol, k, register)
      .select(col("doc_id"), array_join(survivingToks, " ").as("text"))

  /** SemDeDup-style semantic dedup over a PRE-ASSIGNED clustering
    * (`clusterCol` from [[Ivf.assign]] or read back from the IVF
    * index's partition column): within each cluster, drop every vector
    * that has a τ-cosine-similar vector with a smaller id; survivors are
    * the per-similarity-neighborhood minima. Unlike [[embeddingNearDup]]
    * (random sign-buckets, pair OUTPUT) this collapses to survivors
    * directly and bounds the quadratic pass by the SEMANTIC clustering —
    * the production recipe for pruning paraphrase-level duplicates that
    * share no shingles (SemDeDup; the reference has no embedding stage,
    * its dedup ends at key identity — `dblpclient.py:332-339`).
    *
    * Scale shape: cost is Σ|cluster|², not |corpus|²; nlist grows with the
    * corpus to hold E[|cluster|] flat, and the cluster id is the SAME
    * write-time partition key the IVF index uses ([[Ivf.writeIndex]])
    * so at 100 TB both sides of the self-join arrive partition-local
    * (no exchange) and the anti join back is a broadcast of dropped ids
    * per cluster. Returns (idCol, cluster) survivors. */
  def semanticDedupWithin(assigned: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, tau: Double): DataFrame = {
    val base = assigned.select(
      col(idCol).as("id"), col(vecCol).as("v"), col(clusterCol).as("cluster"))
    val a = base.as("a")
    val b = base.as("b")
    val dropped = a.join(b,
        col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= tau)
      .select(col("b.id").as("id")).distinct()
    base.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cluster"))
  }

  /** [[semanticDedupWithin]] with the assignment step included: nearest
    * fixed centroid per row via the codegen'd kernel (one broadcast pass,
    * no shuffle), then the cluster-bounded survivor pass. Centroids come
    * from [[Ivf.train]]/[[Ivf.trainCached]] — train once per
    * corpus, reuse across batches, exactly like the IVF index. */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])], tau: Double): DataFrame =
    semanticDedupWithin(
      Ivf.assign(emb.select(col(idCol), col(vecCol)), centroids, vecCol),
      idCol, vecCol, "cluster", tau)

  /** Incremental fold of a crawl batch into a stored semantic-dedup
    * labelling — the maintenance leg of [[semanticDedupWithin]] (the same
    * relationship CuckooSeen.insert has to the seen filter): per batch the
    * survivor predicate is re-evaluated ONLY for batch rows, never the
    * stored corpus.
    *
    * Correctness hinges on the greedy rule's one-sided dependence: a row
    * survives iff NO τ-similar SMALLER id shares its cluster, so when
    * batch ids are strictly larger than stored ids (crawl batches are —
    * ids are monotone), stored verdicts can never flip and a batch row's
    * verdict needs (a) the stored rows of its own cluster — survivors AND
    * dropped, a dropped row still suppresses later ids — and (b) its own
    * batch's smaller ids. Fold ≡ one-shot over the union, exactly
    * (OpsSpec pins it; the d20 oracle is d19's full-closure SQL).
    *
    * Scale shape: `storedAll` is the cluster-partitioned corpus on disk
    * (the IVF layout), so the probe join is partition-pruned to the
    * batch's touched clusters — O(|batch| × touched-cluster mass) per
    * batch, vs O(Σ|cluster|²) for a full re-dedup. Returns the updated
    * survivor set (stored survivors ∪ new batch survivors).
    *
    * `storedMaxId`: the stored corpus's max id, which any store tracks for
    * free at append time. When given, the batch's min id is checked
    * against it and a violating fold FAILS FAST — without the check a
    * batch id below a stored id silently corrupts the labelling forever
    * (the fold never re-judges stored rows, so a stored survivor that the
    * one-shot closure would have dropped survives every later fold too).
    * Checking against the stored FRAME here would cost the O(corpus) scan
    * this operator exists to avoid, hence the caller-supplied bound. */
  def semanticDedupUpdate(storedAll: DataFrame, storedSurvivors: DataFrame,
      batchAssigned: DataFrame, idCol: String, vecCol: String,
      tau: Double, clusterCol: String = "cluster",
      storedMaxId: Option[Long] = None): DataFrame = {
    storedMaxId.foreach { bound =>
      val minBatch = batchAssigned.agg(min(col(idCol).cast("long"))).head().get(0)
      if (minBatch != null)
        require(minBatch.asInstanceOf[Long] > bound,
          s"semanticDedupUpdate: batch min id $minBatch <= stored max id $bound — " +
            "the monotone-id precondition is violated; run the one-shot " +
            "semanticDedupWithin over the union instead")
    }
    def shaped(df: DataFrame) = df.select(
      col(idCol).as("id"), col(vecCol).as("v"), col(clusterCol).as("cluster"))
    val b = shaped(batchAssigned)
    val simDrop = (left: DataFrame) =>
      left.as("a").join(b.as("b"),
          col("a.cluster") === col("b.cluster") && col("a.id") < col("b.id"))
        .filter(Similarity.cosine(col("a.v"), col("b.v")) >= tau)
        .select(col("b.id").as("id"))
    val dropped = simDrop(shaped(storedAll)).union(simDrop(b)).distinct()
    val newSurvivors = b.join(dropped, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("cluster").as(clusterCol))
    storedSurvivors.select(col(idCol), col(clusterCol)).unionByName(newSurvivors)
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
