package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.tools.CrawlCli

/** End-to-end E1 lifecycle from CLI flags (round-2 verdict item #8): the
  * reference's whole query surface is its 18 click options
  * (csinsights/process.py:24-153); this drives the engine the same way. */
class CliSpec extends SparkSpec {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("flags parse to the native configs; unknown flags fail loudly") {
    val a = CrawlCli.parse(Seq(
      "--urls", "500", "--budget", "3", "--partitions", "4", "--banded",
      "--dblp_use_filters", "--dblp_access_type", "open,closed",
      "--dblp_from_timestamp", "2019-06-01",
      "--s2_filter_acl", "--s2_filter_arxiv", "--s2_use_abstracts"))
    assert(a.urls == 500 && a.budget == 3 && a.banded)
    assert(a.dblpUseFilters && a.dblpAccessTypes == Seq("open", "closed"))
    assert(a.s2Sources == Seq("ACL", "ArXiv") && a.s2Use == Set("abstracts"))
    val cfg = CrawlCli.config(a)
    assert(cfg.nUrls == 500 && cfg.budget == 3 && cfg.bandedSchedule)
    intercept[IllegalArgumentException](CrawlCli.parse(Seq("--bogus")))
    intercept[IllegalArgumentException](CrawlCli.parse(Seq("--s2_filter_nope")))
  }

  test("export/split flags without --dblp_dump fail loudly instead of silently doing nothing") {
    val a = CrawlCli.parse(Seq("--urls", "100", "--export_jsonl", "/tmp/nowhere"))
    val e = intercept[IllegalArgumentException](CrawlCli.run(spark, a))
    assert(e.getMessage.contains("--export_jsonl"))
    val b = CrawlCli.parse(Seq("--urls", "100", "--split_dump", "/tmp/nowhere"))
    intercept[IllegalArgumentException](CrawlCli.run(spark, b))
  }

  test("full lifecycle from flags: crawl commits batches, replay is a no-op, dump is filtered and exported") {
    val cache = tmp("cli-cache")
    val dump =
      """<?xml version="1.0"?>
        |<dblp><article mdate="2021-05-05" key="a1"><title>Open one</title>
        |<ee type="oa">http://x.example.org/1</ee><year>2021</year></article>
        |<article mdate="2018-01-01" key="a2"><title>Too old</title>
        |<ee type="oa">http://x.example.org/2</ee><year>2018</year></article>
        |<article mdate="2021-07-07" key="a3"><title>Closed</title><year>2021</year></article>
        |</dblp>""".stripMargin
    val dumpFile = Files.createTempDirectory("cli-dump").resolve("dblp.xml")
    Files.write(dumpFile, dump.getBytes(StandardCharsets.UTF_8))
    val out = tmp("cli-export") + "/jsonl"

    val a = CrawlCli.parse(Seq(
      "--cache_dir", cache, "--urls", "400", "--budget", "4", "--partitions", "4",
      "--max_batches", "25",
      "--dblp_dump", dumpFile.toString, "--dblp_use_filters",
      "--dblp_access_type", "open,oa", "--dblp_from_timestamp", "2019-01-01",
      "--export_jsonl", out))
    val s1 = CrawlCli.run(spark, a)
    assert(s1.batchesProcessed > 0 && s1.batchesProcessed <= 25)
    // strict-> timestamp filter drops a2 (2018), access filter drops the
    // ee-less a3 (defaults CLOSED) → exactly a1 admitted and exported
    assert(s1.dblpRecordsAdmitted == 1)
    val exported = spark.read.json(out)
    assert(exported.count() == 1)
    assert(exported.select("key").head().getString(0) == "a1")

    // idempotent replay: everything already committed under the cache root
    val s2 = CrawlCli.run(spark, a.copy(maxBatches = Int.MaxValue))
    assert(s2.batchesProcessed >= 0)
    val s3 = CrawlCli.run(spark, a.copy(maxBatches = Int.MaxValue))
    assert(s3.batchesProcessed == 0, s"replay re-processed ${s3.batchesProcessed} batches")
  }

  test("--split_dump re-frames the monolithic dump and the run ingests the split dir losslessly") {
    val cache = tmp("cli-cache-split")
    val dump = (1 to 9).map { i =>
      s"""<article mdate="2021-05-0$i" key="s$i"><title>T$i</title>
         |<ee type="oa">http://x.example.org/$i</ee><year>2021</year></article>""".stripMargin
    }.mkString("""<?xml version="1.0"?><dblp>""", "\n", "</dblp>")
    val dumpFile = Files.createTempDirectory("cli-dump-split").resolve("dblp.xml")
    Files.write(dumpFile, dump.getBytes(StandardCharsets.UTF_8))
    val split = tmp("cli-split") + "/parts"

    val a = CrawlCli.parse(Seq(
      "--cache_dir", cache, "--urls", "100", "--partitions", "4",
      "--dblp_dump", dumpFile.toString, "--dblp_use_filters",
      "--dblp_access_type", "open,oa", "--dblp_from_timestamp", "2019-01-01",
      "--split_dump", split, "--split_parts", "3"))
    assert(a.splitDump.contains(split) && a.splitParts == 3)
    val s = CrawlCli.run(spark, a)
    assert(s.dblpRecordsAdmitted == 9, s"split-dir ingest admitted ${s.dblpRecordsAdmitted}/9")
    // the re-frame actually produced parallel-readable parts
    assert(new java.io.File(split).listFiles().count(_.getName.endsWith(".txt.gz")) == 3)
  }
}
