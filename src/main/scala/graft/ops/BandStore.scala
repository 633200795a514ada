package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persistent, incrementally-maintained LSH band index over ANY packed
  * bit-signature column (simhash text signatures, phash image signatures —
  * anything [[Dedup.hammingCandidates]] accepts) — the third leg of the
  * engine's incremental-maintenance story:
  *
  *   - seen-set:      [[graft.seen.CuckooSeen.insert]] (O(batch), not O(corpus))
  *   - ANN index:     [[graft.ops.Ivf.appendToIndex]]  (fixed centroids, append)
  *   - near-dup bands: THIS — a crawl batch probes / joins the EXISTING
  *     corpus banding instead of re-banding 100 TB per batch.
  *
  * Layout: banded rows `(id, sig, bucket)` written
  * `partitionBy(band, bpfx)` where `bpfx` = the low `prefixBits` bits of
  * the bucket. A probe touches at most `numBands × 2^prefixBits` partition
  * directories (the full dir space; typically far fewer), and the touched
  * set folds into the scan as a partition filter — probe I/O is
  * proportional to the batch's bucket footprint, never the corpus.
  *
  * The pigeonhole recall guarantee of [[Dedup.hammingCandidates]] carries
  * over unchanged to cross (batch × store) pairs: with
  * `maxHamming < numBands` a true pair cannot differ in every band, so
  * [[probe]] returns EXACTLY the cross hamming ball — verified end-to-end
  * by the `d11_band_store` driver oracle (write + append + probe vs
  * DuckDB's brute-force cross pairs).
  */
object BandStore {

  /** Banding parameters pinned at [[write]] time; append/probe re-derive
    * bands from these (a batch banded with different parameters would
    * silently probe the wrong buckets). */
  final case class Meta(numBands: Int, bits: Int, prefixBits: Int)

  // Meta and layout I/O go through Hadoop FS (not java.nio), so the store
  // works on whatever filesystem the path's scheme names (local, HDFS,
  // object store) — same posture as SnapshotTable's manifests. The
  // SESSION's Hadoop conf is used whenever a session is in hand, so
  // fs-scheme settings (credentials, endpoints) configured on the session
  // reach the store; the bare-Configuration fallback covers detached
  // callers on default-configured filesystems.
  private def fsFor(path: String, conf: org.apache.hadoop.conf.Configuration)
      : (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(conf), p)
  }

  private def metaFile(path: String) = new org.apache.hadoop.fs.Path(path, "_band_meta.json")

  def readMeta(path: String,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): Meta = {
    val (fs, _) = fsFor(path, conf)
    val mf = metaFile(path)
    if (!fs.exists(mf))
      throw new IllegalStateException(
        s"no band-store meta at $path — write() the store before append/probe")
    val in = fs.open(mf)
    val txt = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    def field(k: String): Int =
      (s""""$k":(\\d+)""").r.findFirstMatchIn(txt)
        .getOrElse(throw new IllegalStateException(s"band-store meta missing $k at $path"))
        .group(1).toInt
    Meta(field("num_bands"), field("bits"), field("prefix_bits"))
  }

  /** Any `band=` partition dir present? Hadoop FS (not java.nio) so the
    * check holds on HDFS/object-store paths too. */
  private def hasBandDirs(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("band="))
  }

  private def bandedWithPrefix(df: DataFrame, idCol: String, sigCol: String,
      m: Meta): DataFrame =
    Dedup.bandRows(df, idCol, sigCol, m.numBands, m.bits)
      .withColumn("bpfx", col("bucket").bitwiseAND(lit((1L << m.prefixBits) - 1)).cast("int"))

  /** Range-cluster banded rows on (band, bpfx, bucket) before a
    * partitioned write. Without this, EVERY input task opens a writer per
    * partition directory it touches — tasks × (numBands·2^prefixBits)
    * files (4096 at 32 tasks / 128 dirs), the classic small-file explosion
    * that makes the store slow to write AND slow to probe (listing + one
    * reader per splinter file), fatal on an object store at corpus scale.
    * Range partitioning keeps task count proportional to DATA (the range
    * split is on the high-cardinality bucket, not the 128 dir keys, so a
    * big corpus still fans out to every shuffle partition) while each task
    * covers a contiguous (band, bpfx) span — ~1–2 files per task. Measured
    * on the 2M-corpus bench rebuild: 21.5 s → 1.9 s, 4096 → ~160 files. */
  private def clusteredForWrite(banded: DataFrame): DataFrame =
    banded.repartitionByRange(col("band"), col("bpfx"), col("bucket"))

  /** Build (overwrite) the store from the current corpus. One row-local
    * banding pass, one range shuffle (see [[clusteredForWrite]]), one
    * write. `prefixBits` trades directory count (numBands × 2^prefixBits)
    * against probe pruning granularity — and each directory carries a
    * measured ~16 ms commit/rename floor per write INDEPENDENT of data
    * (the dynamic-partition commit protocol), so size it to the corpus:
    * a few thousand rows per expected dir is the useful minimum; more
    * dirs only pay once probes can actually prune them. */
  def write(corpus: DataFrame, idCol: String, sigCol: String, path: String,
      numBands: Int = 8, bits: Int = 64, prefixBits: Int = 6): Unit = {
    require(numBands >= 1 && bits >= 1 && bits <= 64, s"bad banding ($numBands bands, $bits bits)")
    require(prefixBits >= 0 && prefixBits <= 16,
      s"prefixBits=$prefixBits: 2^prefixBits directories per band must stay filesystem-sane")
    val m = Meta(numBands, bits, prefixBits)
    clusteredForWrite(bandedWithPrefix(corpus, idCol, sigCol, m))
      .withColumnRenamed("__sig", "sig")
      .write.mode("overwrite")
      // task-side commit (FileOutputCommitter v2): the job-commit pass
      // otherwise renames each partition directory's output sequentially
      // on the driver — a ~16 ms/dir floor independent of data that
      // dominates small appends at numBands × 2^prefixBits dirs. Safe
      // here: ingest() is documented replay-safe without a commit log
      // (a replayed batch's duplicate store rows are collapsed by
      // probe's distinct), so partial task output from a failed write is
      // covered by the same replay contract.
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .partitionBy("band", "bpfx").parquet(path)
    // meta AFTER the parquet overwrite (which clears the directory)
    val (fs, _) = fsFor(path, corpus.sparkSession.sessionState.newHadoopConf())
    val out = fs.create(metaFile(path), true)
    try out.write(
      s"""{"num_bands":$numBands,"bits":$bits,"prefix_bits":$prefixBits}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Incrementally fold a crawl batch into the store: band with the
    * STORED parameters, `mode=append` — only directories owning batch
    * rows gain files, existing files untouched, O(batch) work. Append ≡
    * rebuild row-for-row (BandStoreSpec), mirroring the fixed-centroid
    * contract of [[Ivf.appendToIndex]].
    *
    * `bandedRowsHint`: the MEASURED banded row count when the caller
    * already knows it ([[ingest]]'s probe counts it in the same job that
    * collects the touched-dir set — one job, two facts). A batch at or
    * under `graft.band.smallAppendRows` (default 200k banded rows)
    * skips [[clusteredForWrite]]'s range pass — its sampling scan plus
    * range exchange cost more than they organize at that size — and
    * writes from ONE task instead: exactly one file per touched
    * directory (the same file count the range path yields for a small
    * batch), no sampling job, no shuffle. Larger batches, and callers
    * with no measurement, keep the range-clustered path — the layout
    * that scales. */
  def append(batch: DataFrame, idCol: String, sigCol: String, path: String,
      bandedRowsHint: Option[Long] = None): Unit = {
    val banded = bandedWithPrefix(batch, idCol, sigCol,
      readMeta(path, batch.sparkSession.sessionState.newHadoopConf()))
    val smallRows = batch.sparkSession.conf
      .getOption("graft.band.smallAppendRows").map(_.toLong).getOrElse(200000L)
    val clustered = bandedRowsHint match {
      case Some(n) if n <= smallRows => banded.coalesce(1)
      case _ => clusteredForWrite(banded)
    }
    clustered
      .withColumnRenamed("__sig", "sig")
      .write.mode("append")
      // v2 task-side commit — see write(); the append path is the
      // per-crawl-batch hot path, where the per-directory job-commit
      // rename floor would dominate O(batch) work
      .option("mapreduce.fileoutputcommitter.algorithm.version", "2")
      .partitionBy("band", "bpfx").parquet(path)
    ()
  }

  /** Near-dup candidates between a NEW batch and the stored corpus:
    * exactly the cross pairs within `maxHamming` (pigeonhole — see class
    * doc), as `(store_id, batch_id, hamming)`.
    *
    * Scale shape: the batch is banded row-locally and its touched
    * `(band, bpfx)` set — bounded by `numBands × 2^prefixBits` (512 at
    * the defaults), INDEPENDENT of batch and corpus size — folds into
    * the store scan as a partition filter (plan-asserted in
    * BandStoreSpec). The bucket join broadcasts the batch side only when
    * its MEASURED banded row count fits `graft.band.broadcastMaxRows`
    * (default 2M banded rows ≈ 100 MB; the count rides the same job that
    * collects the touched-dir set, no extra scan); a giant batch takes a
    * shuffled join on the same keys — never a corpus scan, and never a
    * driver-breaking forced broadcast (an unconditional `broadcast()`
    * hint is honored past every safety threshold and collects the whole
    * banded batch to the driver).
    *
    * The batch source is scanned twice (touched-set collect + the join) —
    * banding itself is row-local codegen'd work, so no persist is managed
    * here (a persist released in this method would be evicted before the
    * caller runs the LAZY result; cf. the register-callback contract in
    * [[graft.seen.CuckooSeen]]). A caller whose batch derivation is
    * expensive persists it before calling. */
  def probe(batch: DataFrame, idCol: String, sigCol: String, path: String,
      maxHamming: Int,
      onBandedRows: Long => Unit = _ => ()): DataFrame = {
    val m = readMeta(path, batch.sparkSession.sessionState.newHadoopConf())
    require(maxHamming < m.numBands,
      s"maxHamming=$maxHamming needs < numBands=${m.numBands} bands for the pigeonhole recall guarantee")
    val spark = batch.sparkSession
    // A store with no banded data yet (write() of an empty corpus — the
    // first micro-batch of a streaming ingest loop) has no `band=` dirs:
    // short-circuit to an empty result rather than building a scan over a
    // partition-less relation (a relation created over the empty dir
    // resolves with an EMPTY partition schema; if files are appended
    // before its lazy listing settles, the reader sees partitioned files
    // through a partition-less plan and fails its arity assertion).
    if (!hasBandDirs(spark, path))
      return batch.select(col(idCol).as("store_id"), col(idCol).as("batch_id"),
        lit(0).as("hamming")).limit(0)
    val b = bandedWithPrefix(batch, idCol, sigCol, m)
      .select(col("id").as("batch_id"), col("__sig").as("batch_sig"),
        col("band"), col("bucket"), col("bpfx"))
    val dirKey = col("band") * lit(1 << m.prefixBits) + col("bpfx")
    // bounded: ≤ numBands × 2^prefixBits rows, whatever the batch size —
    // and the same aggregate measures the banded batch size for the
    // broadcast decision below (one job, two facts)
    val perDir = b.groupBy(dirKey.as("k")).agg(count(lit(1)).as("n")).collect()
    val touched = perDir.map(_.getInt(0)).toSeq
    val bandedRows = perDir.map(_.getLong(1)).sum
    onBandedRows(bandedRows) // [[ingest]]'s append-path size hint — free here
    // explicit schema (id's type taken from the batch — the two sides must
    // agree for the bucket join anyway): no inference job, and an EMPTY
    // store (freshly write()-initialized, no data files yet) reads as an
    // empty frame instead of failing inference — the state of the store
    // when a streaming ingest loop processes its first micro-batch
    val storeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", batch.schema(idCol).dataType),
      org.apache.spark.sql.types.StructField("sig", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bpfx", org.apache.spark.sql.types.IntegerType)))
    val store = spark.read.schema(storeSchema).parquet(path)
      .filter(dirKey.isin(touched: _*))
      .select(col("id").as("store_id"), col("sig").as("store_sig"),
        col("band"), col("bucket"))
    val maxBroadcastRows = spark.conf.getOption("graft.band.broadcastMaxRows")
      .map(_.toLong).getOrElse(2000000L)
    val probeSide = b.drop("bpfx")
    val joinSide =
      if (bandedRows <= maxBroadcastRows) broadcast(probeSide) else probeSide
    // filter BEFORE the distinct: hamming is deterministic per pair, so
    // pairs beyond the ball never enter the dedup shuffle
    store.join(joinSide, Seq("band", "bucket"))
      .select(col("store_id"), col("batch_id"),
        bit_count(col("store_sig").bitwiseXOR(col("batch_sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The micro-batch near-dup step of a streaming crawl loop: emit every
    * near-dup pair the batch introduces, then fold the batch into the
    * store. Returned pairs = cross pairs against the stored corpus
    * ([[probe]]) ∪ intra-batch pairs ([[Dedup.hammingCandidates]] at the
    * STORED banding parameters), normalized to `(id_a, id_b, hamming)`
    * with `id_a < id_b`. Over any split of a corpus into micro-batches the
    * per-batch unions reproduce EXACTLY the all-pairs hamming ball of the
    * whole corpus, each pair once — a pair's later id finds its earlier id
    * either in the store (cross) or in its own batch (intra). Asserted in
    * BandStoreSpec against a genuine Structured Streaming foreachBatch
    * drive.
    *
    * Pairs are MATERIALIZED (persist + count) before the append — a lazy
    * result computed after the append could see the batch through a
    * re-listed store and pair rows with themselves. The persist is handed
    * to `register` (CuckooSeen's release contract): the caller unpersists
    * after consuming. Replay-safe without a commit log, twice over: a
    * crashed-and-replayed batch appends its rows twice, but (1) LATER
    * batches' probes are unchanged — [[probe]]'s distinct collapses
    * duplicate store rows — and (2) the replayed batch's OWN emission is
    * identical to the first run: self-pairs are filtered, and the
    * batch×batch pairs the probe now also sees through the store coincide
    * with the intra set under the trailing distinct (duplicate store rows
    * cost bytes only, reclaimed at the next [[write]] rebuild).
    *
    * Like the d3 self-join story, exact-duplicate mass should be collapsed
    * via [[Dedup.exact]] BEFORE ingest: a degenerate all-same-signature
    * cluster makes its bucket quadratic (the intra side is `maxBucket`-
    * capped; the cross side is exact by contract). */
  def ingest(batch: DataFrame, idCol: String, sigCol: String, path: String,
      maxHamming: Int,
      register: org.apache.spark.sql.Dataset[_] => Unit = _ => ()): DataFrame = {
    val m = readMeta(path, batch.sparkSession.sessionState.newHadoopConf())
    var bandedRows: Option[Long] = None // measured by probe (absent on the empty-store path)
    val cross = probe(batch, idCol, sigCol, path, maxHamming,
        onBandedRows = n => bandedRows = Some(n))
      .filter(col("store_id") =!= col("batch_id")) // replay: a row meets itself
      .select(least(col("store_id"), col("batch_id")).as("id_a"),
        greatest(col("store_id"), col("batch_id")).as("id_b"), col("hamming"))
    val intra = Dedup.hammingCandidates(batch, idCol, sigCol, maxHamming,
        m.numBands, m.bits)
      .select(col("id_a"), col("id_b"), col("hamming"))
    val pairs = cross.unionByName(intra).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    register(pairs)
    pairs.count() // materialize BEFORE the append (see above)
    append(batch, idCol, sigCol, path, bandedRowsHint = bandedRows)
    pairs
  }
}
