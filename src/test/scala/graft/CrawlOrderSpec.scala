package graft

import org.apache.spark.sql.functions._

import graft.model.Synth
import graft.pipeline.CrawlPipeline
import graft.refsim.ReferenceSim

/** The north-rule equivalence gate: crawl order and URL-seen set must
  * match the reference semantics exactly under the same seed list and
  * politeness budget (BASELINE.md). The oracle is the pure-Scala
  * ReferenceSim (SURVEY.md §5 — the reference itself has no tests).
  */
class CrawlOrderSpec extends SparkSpec {

  private val N = 3000L

  private def disallowMap: Map[String, String] =
    (0 until Synth.NumHosts).filter(_ % 10 == 3)
      .map(h => s"h$h.example.com" -> "/img/").toMap

  test("reference-equivalence mode reproduces the sequential crawl order EXACTLY") {
    val cfg = CrawlPipeline.Config(nUrls = N, referenceEquivalence = true, numPartitions = 8)
    val scheduled = CrawlPipeline.planAll(spark, cfg)
      .select("canonical_url", "batch_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._2)

    val seedUrls = (0L until N).map(Synth.seedUrlOf)
    val (golden, goldenSeen) = ReferenceSim.crawlSequential(seedUrls, disallowMap)

    assert(scheduled.length == golden.length,
      s"crawl length ${scheduled.length} != golden ${golden.length}")
    scheduled.zip(golden).foreach { case ((cu, b), g) =>
      assert(cu == g.canonicalUrl && b == g.batchId, s"order diverges at batch $b: $cu vs ${g.canonicalUrl}")
    }
    assert(scheduled.map(_._1).toSet == goldenSeen)
  }

  test("politeness mode matches the per-host budget rank rule") {
    val budget = 3
    val cfg = CrawlPipeline.Config(nUrls = N, budget = budget, numPartitions = 8)
    val got = CrawlPipeline.planAll(spark, cfg)
      .select("canonical_url", "host", "batch_id", "rank_in_batch")
      .collect()
      .map(r => ReferenceSim.Crawled(r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .sortBy(c => (c.batchId, c.host, c.rankInBatch))

    val seeds = (0L until N).map(i => (Synth.seedUrlOf(i), i, Synth.priorityOf(i)))
    val golden = ReferenceSim.crawlPoliteness(seeds, budget, disallowMap)

    assert(got.length == golden.length)
    got.zip(golden).foreach { case (g, e) => assert(g == e, s"mismatch: $g vs $e") }
  }

  test("banded rank is bit-identical to the single-window rank") {
    import graft.sched.Scheduler
    val f = CrawlPipeline.planAll(spark, CrawlPipeline.Config(nUrls = N, numPartitions = 8))
      .select("canonical_url", "host", "priority", "seed_rank", "depth")
    val plain = Scheduler.schedule(f, None, 3)
      .select("canonical_url", "rk", "batch_id", "rank_in_batch")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).sortBy(_._1)
    val banded = Scheduler.scheduleBanded(f, None, 3)
      .select("canonical_url", "rk", "batch_id", "rank_in_batch")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).sortBy(_._1)
    assert(plain.length == banded.length)
    plain.zip(banded).foreach { case (p, b) => assert(p == b, s"banded rank diverged: $p vs $b") }
  }

  test("politeness invariant: no host exceeds its budget in any batch") {
    val cfg = CrawlPipeline.Config(nUrls = N, budget = 2, numPartitions = 8)
    val over = CrawlPipeline.planAll(spark, cfg)
      .groupBy("host", "batch_id").count()
      .filter(col("count") > 2)
      .count()
    assert(over == 0)
  }

  test("robots gate removes exactly the disallowed hosts") {
    val cfg = CrawlPipeline.Config(nUrls = N, numPartitions = 8)
    val hosts = CrawlPipeline.planAll(spark, cfg)
      .select("host").distinct().collect().map(_.getString(0)).toSet
    assert(hosts.forall(h => !disallowMap.contains(h)))
  }

  test("Iceberg-layout image table as input: table-derived seeds crawl identically") {
    val root = java.nio.file.Files.createTempDirectory("imgtable").toString
    val (store, seeds) = CrawlPipeline.seedFromImageTable(spark, root, 500L, 4)
    assert(store.count() == 500 && seeds.count() == 500)
    val cfg = CrawlPipeline.Config(nUrls = 500L, referenceEquivalence = true, numPartitions = 4)
    val fromTable = CrawlPipeline.planAll(spark, cfg, seeds = Some(seeds))
      .select("canonical_url", "batch_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    val fromSynth = CrawlPipeline.planAll(spark, cfg)
      .select("canonical_url", "batch_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
    assert(fromTable.toSeq == fromSynth.toSeq)
    // lineage metrics: the corpus commit recorded its row count
    val t = new graft.tableio.SnapshotTable(root)
    assert(t.manifest(t.headId.get).rows == 500L)
  }

  test("bloom fast path is EXACTLY equal to the pure exact anti-join (fp-proof)") {
    // high fpp (1%) so bloom false positives certainly occur; the split
    // (negatives pass, positives exactly confirmed) must not lose them
    import graft.seen.{BloomSeen, ExactSeen}
    val all = CrawlPipeline.planAll(spark, CrawlPipeline.Config(nUrls = 20000L, numPartitions = 8))
      .select("canonical_url", "seed_rank")
    val seen = all.filter(col("seed_rank") % 3 === 0).select("canonical_url")
    val viaBloom = BloomSeen.notSeenExactWithBloomFastPath(all, seen, numBuckets = 8, fpp = 0.01)
      .select("canonical_url").collect().map(_.getString(0)).sorted
    val exact = ExactSeen.notSeen(all, seen)
      .select("canonical_url").collect().map(_.getString(0)).sorted
    assert(viaBloom.length == exact.length,
      s"bloom fast path lost/added rows: ${viaBloom.length} vs ${exact.length}")
    assert(viaBloom.sameElements(exact))
  }

  test("seen-snapshot gating: previously crawled urls never reappear") {
    val cfg = CrawlPipeline.Config(nUrls = N, referenceEquivalence = true, numPartitions = 8)
    val firstHalf = CrawlPipeline.planAll(spark, cfg)
      .filter(col("batch_id") < 50)
      .select("canonical_url")
    val rest = CrawlPipeline.planAll(spark, cfg, seenSnapshot = Some(firstHalf))
    val overlap = rest.join(firstHalf, Seq("canonical_url"), "left_semi").count()
    assert(overlap == 0)
  }
}
