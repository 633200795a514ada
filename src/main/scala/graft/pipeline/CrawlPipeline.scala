package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.UrlCanon
import graft.fetch.Fetch
import graft.model.Synth
import graft.sched.Scheduler
import graft.seen.{BloomSeen, ExactSeen}
import graft.tableio.SnapshotTable

/** End-to-end crawl pipeline: seeds → canonicalize → robots → dedup →
  * seen-gate → politeness schedule → (micro-batch) fetch → snapshot
  * commits. This is the E1 lifecycle of the reference
  * (csinsights/process.py:156-185) rebuilt as Spark jobs with
  * deterministic, resumable micro-batches.
  *
  * Two run modes:
  *  - [[planAll]] / [[runAll]]: the whole schedule as ONE declarative plan
  *    (used for throughput benchmarking — no per-batch job overhead);
  *  - [[runBatches]]: per-micro-batch loop with idempotent snapshot
  *    commits after each batch (used for the resumability guarantee; a
  *    restart replays only uncommitted batches and produces the identical
  *    crawl order — SURVEY §7 hard parts 1-2).
  */
object CrawlPipeline {

  final case class Config(
      nUrls: Long = 10000L,
      budget: Int = 2,
      referenceEquivalence: Boolean = false, // budget-1 single-queue total order
      numPartitions: Int = 32,
      bloomBuckets: Int = 32,
      useBloomPrefilter: Boolean = true,
      bandedSchedule: Boolean = false,
      // auto-select the banded rank once the frontier is big enough that a
      // Zipf-hot host's single window task becomes the critical path
      // (~22% of rows on one core; measured crossover ~1M urls — below it
      // the banded two-pass overhead costs more than the skew it removes)
      bandedAutoThreshold: Long = 1000000L) {
    def useBanded: Boolean = bandedSchedule || nUrls >= bandedAutoThreshold
  }

  /** Canonicalized, robots-gated, deduped frontier with schedule columns.
    * Pure plan — nothing executed. */
  def planAll(spark: SparkSession, cfg: Config,
      seeds: Option[DataFrame] = None,
      seenSnapshot: Option[DataFrame] = None): DataFrame = {
    val raw = seeds.getOrElse(Synth.seedList(spark, cfg.nUrls, cfg.numPartitions).toDF())
    val canon = raw.select(
      UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
      UrlCanon.hostOf(col("url")).as("host"),
      (if (cfg.referenceEquivalence) lit(0L) else col("priority")).as("priority"),
      col("seed_rank"),
      lit(0).as("depth"))
    val robots = Scheduler.robotsFilter(canon, Synth.robotsRules(spark).toDF())
    val deduped = Scheduler.dedupFrontier(robots)
    // explicit repartition by salted canonical-url hash BEFORE the
    // membership gate (BASELINE.json input_hint)
    val spread = deduped.repartition(cfg.numPartitions,
      UrlCanon.saltedKey(col("canonical_url"), BloomSeen.DefaultSalt))
    val gated = seenSnapshot match {
      case Some(seen) =>
        if (cfg.useBloomPrefilter)
          // exact semantics with a Bloom fast path: negatives skip the
          // join entirely; positives are confirmed by the exact anti-join
          BloomSeen.notSeenExactWithBloomFastPath(spread, seen, cfg.bloomBuckets,
            expectedPerShard = math.max(cfg.nUrls / cfg.bloomBuckets, 1024L))
        else ExactSeen.notSeen(spread, seen)
      case None => spread
    }
    if (cfg.referenceEquivalence) {
      // sequential total order: single queue, budget 1
      Scheduler.schedule(gated, None, 1, lit("*"))
    } else if (cfg.useBanded) {
      // two-level banded rank: use when a hot host's partition exceeds
      // what one task should hold (10^10 regime); at small scale the
      // extra pass costs more than the skew it removes
      Scheduler.scheduleBanded(gated, None, cfg.budget)
    } else {
      Scheduler.schedule(gated, None, cfg.budget)
    }
  }

  /** One-shot execution of the full schedule + fetch. Returns the fetch
    * log (not yet committed). */
  def runAll(spark: SparkSession, cfg: Config, store: DataFrame,
      seeds: Option[DataFrame] = None,
      seenSnapshot: Option[DataFrame] = None): DataFrame = {
    val scheduled = planAll(spark, cfg, seeds, seenSnapshot)
    Fetch.fetchBatch(scheduled, store, cfg.numPartitions)
  }

  /** Micro-batch loop with snapshot commits. Resume-safe: batches already
    * committed (by batchId) are skipped, and the schedule is recomputed
    * deterministically so the replayed order is identical.
    *
    * @return number of batches processed in this invocation
    */
  def runBatches(spark: SparkSession, cfg: Config, store: DataFrame,
      tableRoot: String,
      maxBatchesThisRun: Int = Int.MaxValue,
      seeds: Option[DataFrame] = None,
      onBatch: (Long, Long) => Unit = (_, _) => ()): Int = {
    val fetchedT = new SnapshotTable(s"$tableRoot/fetched")
    val seenT = new SnapshotTable(s"$tableRoot/seen")
    // Resume correctness: the schedule is recomputed DETERMINISTICALLY
    // from the seeds (same sort keys ⇒ same ranks ⇒ same batches), and
    // already-committed batch ids are skipped. The seen snapshot is NOT
    // fed back here — doing so would re-rank the remaining urls from
    // batch 0 and change their order vs the uninterrupted run. The seen
    // gate (planAll's seenSnapshot) serves *new* seed campaigns instead.
    val scheduled = planAll(spark, cfg, seeds, None).persist()
    try {
      // Batch ids are DENSE 0..max by construction: per host, batch_id =
      // (rk-1)/budget starts at 0 and increments by 1, so the union over
      // hosts is a contiguous prefix of the naturals. The loop therefore
      // iterates NUMERICALLY off one scalar agg(max) — it never collects
      // the distinct id set to the driver, which at the 10^10-url regime
      // would be ~10^8 ids (GBs) for a Zipf-hot host at small budgets.
      val maxRow = scheduled.agg(max(col("batch_id"))).head()
      val maxBatch = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
      // A batch is done only when BOTH tables carry its commit. A crash
      // between the two commits (fetched landed, seen didn't) must heal on
      // replay, not be skipped — otherwise seenT is permanently missing the
      // batch and later runs re-fetch its urls. fetchedT commits FIRST so a
      // half-committed batch recomputes against a seenT that (like the
      // original run) does not yet contain it — identical ranked set.
      val doneF = fetchedT.committedBatchIds
      val doneS = seenT.committedBatchIds
      var processed = 0
      (0L to maxBatch).iterator.takeWhile(_ => processed < maxBatchesThisRun).foreach { b =>
        if (!(doneF.contains(b) && doneS.contains(b))) {
          val batch = scheduled.filter(col("batch_id") === b)
          if (!doneF.contains(b)) {
            val fetched = Fetch.fetchBatch(batch, store, cfg.numPartitions)
            fetchedT.commit(fetched.drop("bytes"), batchId = b) // never snapshot payloads twice
          }
          seenT.commit( // idempotent per batchId — safe to re-invoke on replay
            batch.select(col("canonical_url"), lit(b).as("first_batch_id")), batchId = b)
          processed += 1
          // per-batch progress cadence (reference: tqdm per release file);
          // row count comes free from the commit manifest's observe metric
          onBatch(b, fetchedT.headId.map(fetchedT.manifest(_).rows).getOrElse(-1L))
        }
      }
      processed
    } finally scheduled.unpersist()
  }

  /** Input per BASELINE.json input_hint: an Iceberg(-layout) table of
    * image+caption rows IS the corpus; the crawl seeds derive from it.
    * Materializes the synthetic corpus into a [[SnapshotTable]] on first
    * call (idempotent), then returns (store table, seed list) — store read
    * through snapshot manifests, seeds via a typed map over `image_id`
    * (Dataset API, no RDD). */
  def seedFromImageTable(spark: SparkSession, tableRoot: String, n: Long,
      partitions: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val t = new SnapshotTable(tableRoot)
    if (t.headId.isEmpty)
      t.commit(Synth.imageDocs(spark, n, partitions).toDF(), batchId = 0L)
    val store = t.read(spark).get
    val seeds = store.select(col("image_id")).as[String].map { id =>
      val i = id.stripPrefix("img").toLong
      graft.model.SeedRow(Synth.seedUrlOf(i), i, Synth.priorityOf(i))
    }.toDF()
    (store, seeds)
  }

  /** Deterministic crawl order as (canonical_url, batch_id, rank_in_batch),
    * sorted — the golden-order comparison artifact. */
  def crawlOrder(fetchLog: DataFrame): DataFrame =
    fetchLog.select("canonical_url", "host", "batch_id", "rank_in_batch")
      .orderBy("batch_id", "host", "rank_in_batch")
}
