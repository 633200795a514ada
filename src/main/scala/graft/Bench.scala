package graft

import org.apache.spark.sql.SparkSession

import graft.model.Synth
import graft.pipeline.CrawlPipeline

/** Benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "frontier":{...},"scaling":{...}}
  *
  *  - `queries`: per-operator wall seconds on SPARK_GRAFT_SF_DIR (driver
  *    contract; run after a warm-up pass so JIT/session setup is not
  *    attributed to the first query).
  *  - `frontier`: sustained fetch-schedule throughput (urls/sec) of the
  *    full crawl plan (canonicalize → robots → dedup → bloom+exact seen
  *    gate → politeness rank → simulated fetch) on a synthetic frontier.
  *  - `scaling`: the north-rule two-cluster-size evidence — the same
  *    frontier job at local[8] vs local[32] on identical input, with
  *    efficiency = (t8/t32)/4 … ≥0.8 target (BASELINE.md; no real cluster
  *    in-sandbox).
  */
object Bench {

  private def mkSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  /** One full crawl schedule+fetch+extract over nUrls synthetic frontier
    * entries; returns urls/sec. Payload store is nUrls/10 docs so the
    * fetch join has both hits and misses.
    *
    * The action aggregates over bytes/md5/phash — NOT a bare count():
    * count() of a left join is the left count, so Catalyst would
    * legitimately eliminate the whole payload join and the bench would
    * measure scheduling only. */
  private def frontierRun(spark: SparkSession, nUrls: Long, parts: Int): (Double, Long) = {
    import org.apache.spark.sql.functions._
    val cfg = CrawlPipeline.Config(nUrls = nUrls, budget = 8,
      numPartitions = parts, bloomBuckets = parts)
    val store = Synth.imageDocs(spark, math.max(nUrls / 10, 1000), parts).toDF()
    var fetched = 0L
    val secs = time {
      val log = CrawlPipeline.runAll(spark, cfg, store,
        seenSnapshot = Some(
          CrawlPipeline.planAll(spark, CrawlPipeline.Config(nUrls = nUrls / 4,
            numPartitions = parts)).select("canonical_url")))
      val row = log.agg(
        count(lit(1)).as("rows"),
        sum(octet_length(col("bytes"))).as("payload_bytes"),
        sum(bit_count(graft.functions.graftfns.phash(col("bytes")))).as("phash_bits"),
        count(col("md5")).as("ok")).head()
      fetched = row.getLong(0)
    }
    (nUrls / secs, fetched)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchUrls = sys.env.getOrElse("SPARK_GRAFT_BENCH_URLS", "2000000").toLong

    val spark = mkSession(cpus)

    // -- per-operator timings (after one untimed warm-up of each) -------
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = time { try fn(spark, sfDir).count() catch { case _: Throwable => () } }
      name -> t
    }

    // -- frontier throughput at the session's parallelism ----------------
    frontierRun(spark, benchUrls / 10, cpus) // JIT/codegen warm-up, untimed
    val (urlsPerSec, fetchedRows) = frontierRun(spark, benchUrls, cpus)
    spark.stop()

    // -- scaling: same job, local[8] then local[32], each after its own
    //    warm-up run so JIT state doesn't distort the ratio ---------------
    val s8 = mkSession(8)
    frontierRun(s8, benchUrls / 10, 8)
    val (thr8, _) = frontierRun(s8, benchUrls, 8)
    s8.stop()
    val s32 = mkSession(32)
    frontierRun(s32, benchUrls / 10, 32)
    val (thr32, _) = frontierRun(s32, benchUrls, 32)
    s32.stop()
    val efficiency = (thr32 / thr8) / 4.0

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val frontier =
      s"""{"urls":$benchUrls,"fetched":$fetchedRows,"urls_per_sec":${urlsPerSec.round}}"""
    val scaling =
      s"""{"n8_urls_per_sec":${thr8.round},"n32_urls_per_sec":${thr32.round},"efficiency":${f"$efficiency%.3f"}}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","frontier":$frontier,"scaling":$scaling}""")
  }
}
