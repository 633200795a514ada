package graft

import java.nio.file.Files

import graft.model.Synth
import graft.pipeline.CrawlPipeline
import graft.tableio.SnapshotTable

/** North-rule resumability: "resumable from checkpoint with per-partition
  * lineage", "preserving deterministic frontier ordering across restarts
  * from any checkpoint" — kill after k batches, restart, final fetch log
  * must equal the uninterrupted run's exactly. */
class ResumeSpec extends SparkSpec {

  private val N = 600L

  private def fetchLogOf(root: String): Seq[(String, Long, Int)] = {
    val t = new SnapshotTable(s"$root/fetched")
    t.read(spark).get
      .select("canonical_url", "batch_id", "rank_in_batch")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .sortBy(x => (x._2, x._1))
      .toSeq
  }

  test("kill-and-resume reproduces the identical crawl order and seen set") {
    val cfg = CrawlPipeline.Config(nUrls = N, budget = 2, numPartitions = 8,
      bloomBuckets = 8)
    val store = Synth.imageDocs(spark, N, 8).toDF()

    // uninterrupted run
    val rootA = Files.createTempDirectory("crawlA").toString
    val a = CrawlPipeline.runBatches(spark, cfg, store, rootA)
    assert(a > 0)

    // interrupted run: 3 batches, then a fresh invocation resumes
    val rootB = Files.createTempDirectory("crawlB").toString
    val b1 = CrawlPipeline.runBatches(spark, cfg, store, rootB, maxBatchesThisRun = 3)
    assert(b1 == 3)
    val b2 = CrawlPipeline.runBatches(spark, cfg, store, rootB)
    assert(b1 + b2 == a, s"batch counts: $b1+$b2 != $a")

    val logA = fetchLogOf(rootA)
    val logB = fetchLogOf(rootB)
    assert(logA == logB, "resumed crawl diverged from uninterrupted crawl")

    val seenA = new SnapshotTable(s"$rootA/seen").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    val seenB = new SnapshotTable(s"$rootB/seen").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    assert(seenA == seenB)
  }

  test("restart from EVERY checkpoint converges to the identical crawl (north rule: any checkpoint)") {
    val cfg = CrawlPipeline.Config(nUrls = N, budget = 2, numPartitions = 8,
      bloomBuckets = 8)
    val store = Synth.imageDocs(spark, N, 8).toDF()
    val rootRef = Files.createTempDirectory("crawlRef").toString
    val total = CrawlPipeline.runBatches(spark, cfg, store, rootRef)
    val refLog = fetchLogOf(rootRef)
    // first / middle / last checkpoint — each full replay costs ~30s of
    // batch jobs, so sample the boundary cases rather than every k
    Set(1, total / 2, total - 1).filter(_ >= 1).foreach { k =>
      val root = Files.createTempDirectory(s"crawlK$k").toString
      assert(CrawlPipeline.runBatches(spark, cfg, store, root, maxBatchesThisRun = k) == k)
      assert(CrawlPipeline.runBatches(spark, cfg, store, root) == total - k)
      assert(fetchLogOf(root) == refLog, s"divergence after kill at batch $k")
    }
  }

  test("crash BETWEEN the two commits heals on replay (fetched landed, seen did not)") {
    val cfg = CrawlPipeline.Config(nUrls = N, budget = 2, numPartitions = 8,
      bloomBuckets = 8)
    val store = Synth.imageDocs(spark, N, 8).toDF()
    val rootRef = Files.createTempDirectory("crawlRef2").toString
    val total = CrawlPipeline.runBatches(spark, cfg, store, rootRef)

    val root = Files.createTempDirectory("crawlHalf").toString
    assert(CrawlPipeline.runBatches(spark, cfg, store, root, maxBatchesThisRun = 3) == 3)
    // fault injection: roll the SEEN table back one commit — exactly the
    // state a crash leaves after fetchedT.commit but before seenT.commit
    val seenT = new SnapshotTable(s"$root/seen")
    val head = seenT.headId.get
    val parent = seenT.manifest(head).parent
    assert(parent >= 0)
    Files.write(java.nio.file.Paths.get(s"$root/seen/HEAD"),
      parent.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(!seenT.committedBatchIds.contains(seenT.manifest(head).batchId))

    // resume: the half-committed batch must HEAL (seen recommitted without
    // re-fetch), then the rest completes; final state identical
    CrawlPipeline.runBatches(spark, cfg, store, root)
    assert(fetchLogOf(root) == fetchLogOf(rootRef))
    val seenRef = new SnapshotTable(s"$rootRef/seen").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    val seenGot = new SnapshotTable(s"$root/seen").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    assert(seenGot == seenRef, "healed seen set diverged")
  }

  test("replaying an already-complete crawl is a no-op") {
    val cfg = CrawlPipeline.Config(nUrls = 200L, budget = 2, numPartitions = 4,
      bloomBuckets = 4)
    val store = Synth.imageDocs(spark, 200L, 4).toDF()
    val root = Files.createTempDirectory("crawlC").toString
    val first = CrawlPipeline.runBatches(spark, cfg, store, root)
    assert(first > 0)
    val again = CrawlPipeline.runBatches(spark, cfg, store, root)
    assert(again == 0)
  }
}
