package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.model.Synth
import graft.streaming.Streaming
import graft.tableio.SnapshotTable

class StreamingSpec extends SparkSpec {

  test("streaming windowed agg over events == its batch twin (st1)") {
    // file-stream sources need a DIRECTORY; stage the single parquet file
    val srcDir = Files.createTempDirectory("events").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(srcDir).schema
    val stream = Streaming.windowedEventCounts(spark, srcDir, schema)
    val qname = "st1mem"
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    q.processAllAvailable(); q.stop()
    // window_start is TIMESTAMP_NTZ → LocalDateTime in rows; compare as strings
    val got = spark.table(qname)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("st1_window_agg")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch)
  }

  test("stateful host limiter grants budget per micro-batch, state persists across batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = Streaming.statefulHostLimiter(input.toDS(), budgetPerBatch = 2)
    val q = out.writeStream.outputMode("append").format("memory").queryName("limiter").start()

    input.addData(("h0", "u3"), ("h0", "u1"), ("h0", "u2"), ("h1", "u9"))
    q.processAllAvailable()
    input.addData(("h0", "u4"), ("h0", "u5"), ("h0", "u6"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("limiter").as[Streaming.GrantDecision].collect()
    val h0b1 = rows.filter(r => r.host == "h0" && Set("u1", "u2", "u3")(r.canonical_url))
    // batch 1: lexicographically smallest two granted, third deferred
    assert(h0b1.filter(_.granted).map(_.canonical_url).sorted.toSeq == Seq("u1", "u2"))
    assert(h0b1.filter(!_.granted).map(_.canonical_url).toSeq == Seq("u3"))
    assert(rows.find(_.canonical_url == "u9").get.granted)
    // batch 2: state carried — grant counter continues from 2
    val h0b2 = rows.filter(r => r.host == "h0" && Set("u4", "u5", "u6")(r.canonical_url))
    assert(h0b2.filter(_.granted).map(_.canonical_url).sorted.toSeq == Seq("u4", "u5"))
    assert(h0b2.filter(_.granted).map(_.host_total_granted).sorted.toSeq == Seq(3L, 4L))
  }

  test("crawl stream drains seed files via foreachBatch and resumes idempotently") {
    import spark.implicits._
    val n = 300L
    val seedsDir = Files.createTempDirectory("seeds").toString
    val root = Files.createTempDirectory("streamcrawl").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    // write seeds in 3 files so the stream sees multiple input splits
    Synth.seedList(spark, n, 3).toDF().write.parquet(s"$seedsDir/batch0")
    val schema = spark.read.parquet(s"$seedsDir/batch0").schema
    val store = Synth.imageDocs(spark, n, 4).toDF()

    Streaming.runCrawlStream(spark, s"$seedsDir/batch0", schema, store, root, ckpt,
      budget = 2, numPartitions = 4)
    val fetched = new SnapshotTable(s"$root/fetched").read(spark).get
    val count1 = fetched.count()
    assert(count1 > 0)
    // every fetched url is unique (dedup within stream worked)
    assert(fetched.select("canonical_url").distinct().count() == count1)

    // restart with same checkpoint: nothing new to process → no new commits
    Streaming.runCrawlStream(spark, s"$seedsDir/batch0", schema, store, root, ckpt,
      budget = 2, numPartitions = 4)
    assert(new SnapshotTable(s"$root/fetched").read(spark).get.count() == count1)

    // late-arriving seed file: only NEW urls crawled, seen ones gated out
    Synth.seedList(spark, n * 2, 3).toDF().filter(col("seed_rank") >= n / 2)
      .write.mode("append").parquet(s"$seedsDir/batch0")
    Streaming.runCrawlStream(spark, s"$seedsDir/batch0", schema, store, root, ckpt,
      budget = 2, numPartitions = 4)
    val after = new SnapshotTable(s"$root/fetched").read(spark).get
    assert(after.count() > count1)
    assert(after.select("canonical_url").distinct().count() == after.count(),
      "seen gate failed: a url was crawled twice across micro-batches")
  }
}
