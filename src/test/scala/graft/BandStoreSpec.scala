package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{BandStore, Dedup}

/** Persistent LSH band index (the dedup leg of the incremental-maintenance
  * triad next to CuckooSeen.insert and Ivf.appendToIndex): append ≡ rebuild
  * at fixed banding parameters, probe = EXACT cross hamming ball
  * (pigeonhole), and the probe's store scan is partition-pruned — the
  * contract that makes per-crawl-batch near-dup maintenance O(batch), not
  * O(corpus), at 100 TB. */
class BandStoreSpec extends SparkSpec {

  private def mix(z: Long): Long = graft.imagecodec.ImageCodec.mix64(z)

  /** 400 base signatures (uniform 64-bit, pairwise far apart w.h.p.) plus
    * 40 planted near-dups: id 1000+i = sig of 10·i with `i % 4` low bits
    * flipped (hamming 0–3 — inside any maxHamming ≥ 3 ball). */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    val base = (0 until 400).map(i => (i.toLong, mix(i * 2654435761L + 17)))
    val planted = (0 until 40).map { i =>
      val src = base(10 * i)._2
      (1000L + i, src ^ ((1L << (i % 4)) - 1))
    }
    (base ++ planted).toDF("id", "sig").repartition(4)
  }

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  /** Brute-force cross pairs within maxHamming — the in-suite oracle. */
  private def bruteCross(store: DataFrame, batch: DataFrame, maxHamming: Int): Set[(Long, Long, Int)] =
    store.select(col("id").as("store_id"), col("sig").as("ssig"))
      .crossJoin(batch.select(col("id").as("batch_id"), col("sig").as("bsig")))
      .select(col("store_id"), col("batch_id"),
        bit_count(col("ssig").bitwiseXOR(col("bsig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("append == rebuild: identical banded rows, existing files untouched") {
    val half1 = corpus.filter(col("id") % 2 === 0)
    val half2 = corpus.filter(col("id") % 2 === 1)
    val incr = tmp("bandappend")
    BandStore.write(half1, "id", "sig", incr, numBands = 8, bits = 64, prefixBits = 4)
    val before = new java.io.File(incr).listFiles().flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty).flatMap(dd =>
        Option(dd.listFiles()).getOrElse(Array.empty))).map(f => f.getPath -> f.lastModified()).toMap
    BandStore.append(half2, "id", "sig", incr)
    val after = new java.io.File(incr).listFiles().flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty).flatMap(dd =>
        Option(dd.listFiles()).getOrElse(Array.empty))).map(f => f.getPath -> f.lastModified()).toMap
    // O(batch): every pre-existing data file survives byte-identical
    // (same path, same mtime) — append only ADDS files
    before.foreach { case (p, m) =>
      if (p.endsWith(".parquet")) assert(after.get(p).contains(m), s"append rewrote $p")
    }
    val full = tmp("bandrebuild")
    BandStore.write(corpus, "id", "sig", full, numBands = 8, bits = 64, prefixBits = 4)
    def rows(p: String) = spark.read.parquet(p)
      .select("id", "sig", "band", "bucket", "bpfx")
      .collect().map(_.toSeq).toSet
    assert(rows(incr) == rows(full), "append diverged from a rebuild")
  }

  test("probe returns EXACTLY the cross hamming ball (pigeonhole, vs brute force)") {
    val store = corpus.filter(col("id") < 1000)
    val batch = corpus.filter(col("id") >= 1000)
    val path = tmp("bandprobe")
    BandStore.write(store, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    val got = BandStore.probe(batch, "id", "sig", path, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = bruteCross(store, batch, 6)
    assert(got == want, s"probe=${got.size} pairs, brute=${want.size}")
    // every planted pair recovered (each 1000+i is within hamming 3 of 10·i)
    assert((0 until 40).forall(i => got.exists(p => p._1 == 10L * i && p._2 == 1000L + i)))
  }

  test("probe's store scan is partition-pruned (PartitionFilters over band/bpfx)") {
    val store = corpus.filter(col("id") < 1000)
    // a tiny batch touches few (band, bpfx) dirs — the pruning payoff
    val batch = corpus.filter(col("id") === 1000L)
    val path = tmp("bandprune")
    BandStore.write(store, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    val probe = BandStore.probe(batch, "id", "sig", path, maxHamming = 6)
    val plan = probe.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*(band|bpfx)".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n${plan.take(2000)}")
    // and it still finds its planted source (10·0 = 0)
    assert(probe.collect().exists(r => r.getLong(0) == 0L && r.getLong(1) == 1000L))
  }

  test("probe degrades to an unhinted join past the broadcast cap — same pairs") {
    val store = corpus.filter(col("id") < 1000)
    val batch = corpus.filter(col("id") >= 1000)
    val path = tmp("banddegrade")
    BandStore.write(store, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    spark.conf.set("graft.band.broadcastMaxRows", "0")
    try {
      val probe = BandStore.probe(batch, "id", "sig", path, maxHamming = 6)
      // no FORCED broadcast hint in the plan: a giant crawl batch must be
      // allowed to shuffle (AQE may still CHOOSE broadcast from measured
      // sizes — that choice is the contract; an unconditional hint that
      // collects 800M banded rows to the driver is not)
      val analyzed = probe.queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"probe still forces a broadcast hint past the cap:\n${analyzed.take(1500)}")
      val got = probe.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == bruteCross(store, batch, 6), "degraded join changed the pair set")
    } finally spark.conf.unset("graft.band.broadcastMaxRows")
  }

  test("write clusters rows into ~one file per task, not tasks × dirs") {
    // the corpus arrives in 4 partitions and lands in 8 bands × 4 bpfx =
    // 32 dirs; without the range clustering, every input task opens a
    // writer per dir it touches (up to 4 × 32 = 128 files). The clustered
    // write keeps total data files bounded by dirs + shuffle partitions —
    // the small-file regression this test locks against.
    val path = tmp("bandfiles")
    BandStore.write(corpus, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 2)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(path))
      .filter(p => p.toString.endsWith(".parquet")).count()
    val dirs = 8 * 4
    val shuffleParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(files <= dirs + shuffleParts,
      s"$files data files for $dirs partition dirs — writer fan-out regressed")
  }

  test("probe bands with the STORED parameters, not the caller's defaults") {
    // store written at numBands=10: a probe derives bands from meta, so a
    // maxHamming of 9 (< 10, but ≥ the write-call default 8) is accepted
    // and still exact
    val store = corpus.filter(col("id") < 1000)
    val batch = corpus.filter(col("id") >= 1000)
    val path = tmp("bandmeta")
    BandStore.write(store, "id", "sig", path, numBands = 10, bits = 64, prefixBits = 4)
    assert(BandStore.readMeta(path) == BandStore.Meta(10, 64, 4))
    val got = BandStore.probe(batch, "id", "sig", path, maxHamming = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == bruteCross(store, batch, 9))
  }

  test("streaming foreachBatch ingest over micro-batches reproduces the batch all-pairs ball") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("bandstream")
    val seeds = java.nio.file.Files.createDirectory(base.resolve("seeds"))
    val path = base.toString + "/store"
    // stage 3 flat micro-batch files (modulo-3 split of the planted corpus)
    (0 until 3).foreach { k =>
      val tmp = java.nio.file.Files.createTempDirectory("bandstage").toString + "/w"
      corpus.filter(col("id") % 3 === k).coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, seeds.resolve(s"b$k.parquet"))
      ()
    }
    // store initialized EMPTY — the first micro-batch probes a store with
    // no data files (explicit-schema read, not inference)
    BandStore.write(corpus.limit(0), "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    val got = scala.collection.mutable.Set[(Long, Long, Int)]()
    var batches = 0
    // stream-maintained cluster labels: each micro-batch folds its ingest
    // pairs into the running labelling (the e3 composition)
    import spark.implicits._
    var labels = Seq.empty[(Long, Long)].toDF("doc_id", "component_rep")
    val q = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(seeds.toString)
      .writeStream.option("checkpointLocation", base.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches += 1
        val rel = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Dataset[_]]()
        val pairs = BandStore.ingest(df, "id", "sig", path, maxHamming = 6, register = rel += _)
        got ++= pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        labels = Dedup.updateComponents(labels, pairs)
        rel.foreach(_.unpersist()) // safe: updateComponents checkpointed its closure
        ()
      }.start()
    q.awaitTermination()
    assert(batches == 3, s"expected 3 micro-batches, saw $batches")
    val want = Dedup.hammingCandidates(corpus, "id", "sig", maxHamming = 6, numBands = 8, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.toSet == want,
      s"incremental=${got.size} pairs vs batch=${want.size} — a pair was missed or invented")
    // the stream-maintained labelling equals the one-shot closure of the
    // whole-corpus ball — micro-batch order left no trace
    val gotLabels = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val wantLabels = Dedup.connectedComponents(
        want.toSeq.map(p => (p._1, p._2)).toDF("id_a", "id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotLabels == wantLabels,
      s"stream-maintained labels diverged: ${gotLabels.size} vs ${wantLabels.size} nodes")
  }

  test("replayed ingest (crash after append) emits identical pairs; later probes unchanged") {
    val init = corpus.filter(col("id") < 1000)
    val batch = corpus.filter(col("id") >= 1000 && col("id") < 1020)
    val later = corpus.filter(col("id") >= 1020)
    val path = tmp("bandreplay")
    BandStore.write(init, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    def collectPairs(df: DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val first = collectPairs(BandStore.ingest(batch, "id", "sig", path, maxHamming = 6))
    // sanity: the emission is the brute-force pair contribution of the batch
    assert(first == bruteCross(init, batch, 6)
      .map { case (a, b, h) => (math.min(a, b), math.max(a, b), h) })
    val laterBefore = collectPairs(BandStore.probe(later, "id", "sig", path, maxHamming = 6))
    // replay: batch is already in the store — emission must not change
    // (no self-pairs, no doubled intra) and neither must later probes
    val replayed = collectPairs(BandStore.ingest(batch, "id", "sig", path, maxHamming = 6))
    assert(replayed == first, "replayed ingest diverged from the original emission")
    val laterAfter = collectPairs(BandStore.probe(later, "id", "sig", path, maxHamming = 6))
    assert(laterAfter == laterBefore, "doubled store rows leaked into a later probe")
  }

  test("label snapshots: crash between band append and label commit heals on replay") {
    // The full persistence story of the dedup-maintenance loop (e3):
    // band rows land in the BandStore DURING ingest, the updated labelling
    // lands in a SnapshotTable commit keyed by batchId AFTER it — so a
    // crash in between leaves the store ahead of the labels. Replay must
    // heal: re-ingest of an already-stored batch emits identical pairs
    // (proven by the replay test above), refolding pairs already reflected
    // in the labelling is a fixed point of updateComponents, and the batch
    // key makes the commit itself idempotent. Current labelling = the HEAD
    // commit alone (each commit is a full snapshot at this scale; a
    // 10^10-label deployment commits the touched-split's closure output as
    // a delta and resolves latest-batch-wins — same manifest machinery).
    import graft.tableio.SnapshotTable
    import spark.implicits._
    val path = tmp("bandlabels")
    val tableRoot = java.nio.file.Files.createTempDirectory("labeltable").toString
    BandStore.write(corpus.limit(0), "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    val table = new SnapshotTable(tableRoot)
    def currentLabels: DataFrame = table.headId match {
      case Some(id) =>
        val files = table.manifest(id).files.map(f => tableRoot + "/" + f)
        spark.read.parquet(files: _*)
      case None => Seq.empty[(Long, Long)].toDF("doc_id", "component_rep")
    }
    def foldBatch(k: Long, df: DataFrame): Unit =
      if (!table.committedBatchIds.contains(k)) {
        val pairs = BandStore.ingest(df, "id", "sig", path, maxHamming = 6)
        table.commit(Dedup.updateComponents(currentLabels, pairs), batchId = k)
        pairs.unpersist()
        ()
      }
    val batches = (0 until 3).map(k => corpus.filter(col("id") % 3 === k))
    foldBatch(0, batches(0))
    foldBatch(1, batches(1))
    // re-delivery of a committed batch is a pure no-op: batch key skips
    // BEFORE the ingest, so the band store gains no rows either
    val headBefore = table.headId
    val storeRowsBefore = spark.read.parquet(path).count()
    foldBatch(1, batches(1))
    assert(table.headId == headBefore && spark.read.parquet(path).count() == storeRowsBefore,
      "replay of a committed batch must not advance the table or the store")
    // CRASH WINDOW: batch 2's ingest ran (store updated, pairs emitted)
    // but the label commit never happened
    BandStore.ingest(batches(2), "id", "sig", path, maxHamming = 6).unpersist()
    assert(!table.committedBatchIds.contains(2L))
    // replay heals: ingest again (idempotent emission), fold, commit
    foldBatch(2, batches(2))
    assert(table.committedBatchIds == Set(0L, 1L, 2L))
    // the healed labelling equals the one-shot closure of the whole ball —
    // neither the crash nor the batch split left a trace
    val got = currentLabels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Dedup.connectedComponents(
        Dedup.hammingCandidates(corpus, "id", "sig", maxHamming = 6, numBands = 8, bits = 64))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want, s"healed labelling diverged: ${got.size} vs ${want.size} nodes")
  }

  test("guards: pigeonhole bound and missing meta fail fast") {
    val path = tmp("bandguard")
    BandStore.write(corpus, "id", "sig", path, numBands = 8, bits = 64, prefixBits = 4)
    val e = intercept[IllegalArgumentException] {
      BandStore.probe(corpus, "id", "sig", path, maxHamming = 8) // == numBands: no guarantee
    }
    assert(e.getMessage.contains("pigeonhole"))
    intercept[IllegalStateException] {
      BandStore.readMeta(tmp("bandempty")) // no meta written
    }
  }
}
