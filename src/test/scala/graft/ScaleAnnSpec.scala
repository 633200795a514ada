package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

/** Scale-shaped ANN evidence (round-2 verdict item #2): the driver-oracle
  * d7/d8 queries prove exactness under near-exhaustive probe budgets; THIS
  * suite proves the budgets a 100 TB deployment would actually run —
  * sub-linear probe fractions (≤25% of buckets/lists) on a 10× corpus —
  * still deliver recall@10 ≥ 0.9, and that IVF's probed lists (not the
  * corpus size) bound the rows scanned.
  *
  * The corpus is CLUSTERED, deterministically: real embedding stores are
  * clustered (that is the regime ANN indexes are built for); uniform-random
  * vectors — the adversarial no-structure case — are covered by the
  * budget-gradient tests in OpsSpec. 5000 vectors = 10× the 500-vector
  * base table the d-queries run on.
  */
class ScaleAnnSpec extends SparkSpec {

  private val Dims = 32
  private val NClusters = 64
  private val PerCluster = 78 // ≈ 5000 vectors on 64 clusters
  private val N = NClusters * PerCluster

  private def mix(z: Long): Long = graft.imagecodec.ImageCodec.mix64(z)
  // deterministic value in [-1, 1)
  private def unit(z: Long): Float = ((mix(z) % 100000L) / 100000.0).toFloat

  /** vec i belongs to cluster i % NClusters (interleaved ids, so IVF's
    * lowest-id seed rule draws seeds from DISTINCT clusters); each point =
    * its cluster center + 2% deterministic noise. */
  private lazy val corpus = {
    import spark.implicits._
    val rows = (0 until N).map { i =>
      val c = i % NClusters
      val v = Array.tabulate(Dims)(d => unit(c * 131L + d) + 0.02f * unit(i * 7919L + d))
      (i.toLong, v)
    }
    rows.toDF("vec_id", "embedding").repartition(8).persist()
  }

  private lazy val queries = corpus.filter(col("vec_id") < 20)

  private lazy val truth: Set[(Long, Long)] =
    Similarity.bruteForceTopK(corpus, queries, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet

  private def recallOf(got: Set[(Long, Long)]): Double =
    truth.intersect(got).size.toDouble / truth.size

  test("hyperplane LSH at a sub-linear probe budget (7/64 buckets ≈ 11%) has recall@10 ≥ 0.9") {
    // planes=6 → 64 buckets; probeHamming=1 probes 1+6 = 7 of them per
    // query — the fraction that makes multi-probe LSH worth running at
    // 100 TB (probing most buckets would be a scan with extra steps)
    val got = Similarity.annTopK(corpus, queries, 10, planes = 6, probeHamming = 1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val r = recallOf(got)
    assert(r >= 0.9, s"LSH recall@10 = $r at 7/64 buckets")
  }

  test("IVF at nprobe/nlist = 4/16 (25%) has recall@10 ≥ 0.9 and scans only the probed lists") {
    val nlist = 16
    val nprobe = 4
    val cents = Ivf.train(corpus, nlist)
    val got = Ivf.topK(corpus, queries, 10, nlist, nprobe, centroids = Some(cents))
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val r = recallOf(got)
    assert(r >= 0.9, s"IVF recall@10 = $r at $nprobe/$nlist lists")

    // rows-scanned bound: the probed PARTITIONS, not the corpus, bound the
    // I/O. Worst query's probed-list row total must stay well under the
    // corpus — ≤ 2× the ideal nprobe/nlist fraction (list sizes are only
    // approximately balanced).
    val listSizes = Ivf.assign(corpus, cents).groupBy("cluster").count()
      .collect().map(row => row.getAs[Int]("cluster") -> row.getAs[Long]("count")).toMap
    val topLists = listSizes.values.toSeq.sorted.reverse.take(nprobe).sum
    assert(topLists <= 2L * N * nprobe / nlist,
      s"worst-case probed rows $topLists exceed 2× the $nprobe/$nlist fraction of $N")
  }

  test("train-once index: cached centroids are reused (no retraining) and give identical results") {
    val tag = s"scaleann-${System.identityHashCode(this)}"
    val c1 = Ivf.trainCached(tag, corpus, 16)
    // second call must return the SAME memoized object — no training jobs
    val c2 = Ivf.trainCached(tag, corpus.limit(1) /* would train differently */, 16)
    assert(c1 eq c2, "trainCached retrained for the same corpus tag")
    val a = Ivf.topK(corpus, queries, 10, 16, 4, centroids = Some(c1)).collect().toSet
    val b = Ivf.topK(corpus, queries, 10, 16, 4, centroids = Some(c2)).collect().toSet
    assert(a == b)
  }

  test("materialized IVF index: probes are PartitionFilters-pruned scans, results identical to topK") {
    val nlist = 16
    val nprobe = 4
    val cents = Ivf.train(corpus, nlist)
    val path = java.nio.file.Files.createTempDirectory("ivfindex").toString + "/index"
    Ivf.writeIndex(corpus, cents, path)
    // centroids round-trip with the index
    assert(Ivf.readIndexCentroids(path) == cents)
    val indexed = Ivf.topKIndexed(path, queries, 10, nprobe, cents)
    val direct = Ivf.topK(corpus, queries, 10, nlist, nprobe, centroids = Some(cents))
    assert(indexed.collect().toSet == direct.collect().toSet,
      "indexed probe diverged from the in-memory plan")
    // the scan itself must be partition-pruned: the probed-list isin
    // lands in PartitionFilters (directory pruning — only nprobe-ish of
    // the nlist partition dirs are read), NOT as a post-scan Filter
    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).isDefined,
      s"no partition pruning in plan:\n${plan.take(2000)}")
  }

  test("IVF incremental append: append == rebuild at fixed centroids, probe stays pruned, staleness trips on drift") {
    import spark.implicits._
    val nlist = 16
    val nprobe = 4
    // base = first 4000 vectors; batch = the remaining 1000 (same
    // distribution — the steady-state crawl batch)
    val base = corpus.filter(col("vec_id") < 4000)
    val batch = corpus.filter(col("vec_id") >= 4000)
    val cents = Ivf.train(base, nlist)
    val path = java.nio.file.Files.createTempDirectory("ivfappend").toString + "/index"
    Ivf.writeIndex(base, cents, path)
    val report = Ivf.appendToIndex(batch, path)
    assert(report.batchRows == batch.count())
    assert(!report.stale,
      s"in-distribution batch flagged stale: $report")
    // append ≡ rebuild at fixed centroids: identical (vec_id, cluster) rows
    val rebuilt = java.nio.file.Files.createTempDirectory("ivfrebuild").toString + "/index"
    Ivf.writeIndex(corpus, cents, rebuilt)
    val gotRows = spark.read.parquet(path).select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val rebuiltRows = spark.read.parquet(rebuilt).select("vec_id", "cluster")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(gotRows == rebuiltRows, "appended index diverged from a rebuild")
    // probes over the appended index: still partition-pruned, and row-equal
    // to the in-memory plan over the full corpus
    val indexed = Ivf.topKIndexed(path, queries, 10, nprobe, cents)
    val direct = Ivf.topK(corpus, queries, 10, nlist, nprobe, centroids = Some(cents))
    assert(indexed.collect().toSet == direct.collect().toSet)
    val plan = indexed.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).isDefined)
    // a DRIFTED batch (far outside the training distribution) must trip
    // the staleness bound — the retrain signal
    val drifted = (0 until 200).map { i =>
      (100000L + i, Array.tabulate(Dims)(d => 50.0f + unit(i * 131L + d)))
    }.toDF("vec_id", "embedding")
    val driftReport = Ivf.appendToIndex(drifted, path)
    assert(driftReport.stale, s"drifted batch not flagged: $driftReport")
  }
}
