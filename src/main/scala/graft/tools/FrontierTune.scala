package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.CrawlPipeline

/** Frontier-throughput tuning harness: one (cores, urls, banded) cell per
  * run, N reps, prints per-rep urls/sec. Used to choose the banded-schedule
  * auto-threshold and chase headline regressions without paying for the
  * full Bench. */
object FrontierTune {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("FT_CPUS", "32").toInt
    val urls = sys.env.getOrElse("FT_URLS", "2000000").toLong
    val banded = sys.env.getOrElse("FT_BANDED", "auto") // on|off|auto
    val reps = sys.env.getOrElse("FT_REPS", "3").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("frontier-tune")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "0")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = CrawlPipeline.Config(nUrls = urls, budget = 8,
      numPartitions = cpus, bloomBuckets = cpus,
      bandedSchedule = banded == "on",
      bandedAutoThreshold = if (banded == "off") Long.MaxValue else 1000000L)
    val seenDir = java.nio.file.Files.createTempDirectory("ft-seen").toString
    CrawlPipeline.planAll(spark, CrawlPipeline.Config(nUrls = urls / 4,
      numPartitions = cpus)).select("canonical_url")
      .write.mode("overwrite").parquet(seenDir)
    val store = graft.model.Synth.imageDocs(spark, urls * 98 / 100, cpus).toDF()
    store.write.mode("overwrite").parquet("/tmp/ft-store")
    val storeDf = spark.read.parquet("/tmp/ft-store")

    def run(): Double = {
      val log = CrawlPipeline.runAll(spark, cfg, storeDf,
        seenSnapshot = Some(spark.read.parquet(seenDir)))
      val agg = log.agg(count(lit(1)), sum(octet_length(col("bytes"))),
        count(col("md5")))
      agg.queryExecution.executedPlan
      val t0 = System.nanoTime()
      agg.head()
      urls / ((System.nanoTime() - t0) / 1e9)
    }
    run() // warm-up
    val xs = (1 to reps).map(_ => run())
    println(s"FT cores=$cpus urls=$urls banded=$banded reps=" +
      xs.map(x => f"$x%.0f").mkString(",") + f" best=${xs.max}%.0f")
    spark.stop()
  }
}
