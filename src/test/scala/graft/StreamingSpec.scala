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

  test("watermark drops late data in append mode; on-time windows finalize exactly") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("late-src").toString
    val ckpt = Files.createTempDirectory("late-ckpt").toString
    val outDir = Files.createTempDirectory("late-out").toString + "/o"
    def row(h: Int, m: Int, typ: String, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00"), typ, v)
    // file-stream sources want FLAT files in the watched dir
    def stage(name: String, rows: Seq[(java.sql.Timestamp, String, Double)]): Unit = {
      val tmp = Files.createTempDirectory("late-stage").toString + "/w"
      rows.toDF("ts", "event_type", "value").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$srcDir/$name"))
      ()
    }
    // phase 1: on-time data through hour 0..3 — watermark advances to 02:30
    stage("batch1.parquet", Seq(row(0, 30, "a", 1.0), row(1, 10, "a", 2.0),
      row(2, 20, "a", 3.0), row(3, 30, "a", 4.0)))
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = Streaming.windowedEventCounts(spark, srcDir, schema)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    // phase 2: one LATE row for hour 0 (behind the persisted watermark) and
    // one on-time row for hour 4
    stage("batch2.parquet", Seq(row(0, 45, "a", 100.0), row(4, 15, "a", 5.0)))
    runOnce()
    val got = spark.read.parquet(outDir)
      .collect().map(r => r.get(0).toString -> (r.getLong(2), r.getDouble(3))).toMap
    // hour-0 window finalized WITHOUT the late row (count 1, sum 1.0):
    // watermark (03:30 - 1h = 02:30) had passed its end before the late
    // row arrived — the late row is DROPPED, exactly the semantics a
    // 10^10-row streaming agg needs to bound state
    assert(got.keys.exists(_.startsWith("2024-03-01T00")), s"hour-0 window never emitted: $got")
    val h0 = got.find(_._1.startsWith("2024-03-01T00")).get._2
    assert(h0 == ((1L, 1.0)), s"late row leaked into the finalized window: $h0")
    // a batch query over the same files WOULD include the late row — the
    // difference is the watermark, not data loss elsewhere
    val batchH0 = spark.read.parquet(srcDir)
      .filter(col("ts") < "2024-03-01 01:00:00")
      .agg(count(lit(1)), sum("value")).head()
    assert(batchH0.getLong(0) == 2 && batchH0.getDouble(1) == 101.0)
  }

  test("watermarked stream dedup: cross-batch redelivery leaves no trace ≡ batch st6") {
    val srcDir = Files.createTempDirectory("dedup-src").toString
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/batch1.parquet"))
    val schema = spark.read.parquet(srcDir).schema
    // delay far above the fixture's time span: nothing is ever late, so
    // every redelivery hits LIVE dedup state — the pure-dedup leg
    val stream = Streaming.dedupedEventCounts(spark, srcDir, schema, delay = "3650 days")
    val qname = "st6mem"
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName(qname).start()
    q.processAllAvailable()
    // batch 2 = the SAME redelivery the batch twin plants (id % 13 == 5),
    // arriving in a LATER micro-batch — state must remember across batches
    val dups = spark.read.parquet(s"$srcDir/batch1.parquet")
      .filter(col("event_id") % 13 === 5)
    val tmp = Files.createTempDirectory("dedup-stage").toString + "/d"
    dups.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$srcDir/batch2.parquet"))
    q.processAllAvailable(); q.stop()
    val got = spark.table(qname)
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = SparkEntry.queries("st6_stream_dedup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == batch)
  }

  test("stream-dedup state is watermark-bounded: in-delay dup suppressed, sub-watermark replay dropped") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("dedupwm-src").toString
    val outDir = Files.createTempDirectory("dedupwm-out").toString + "/o"
    val ckpt = Files.createTempDirectory("dedupwm-ckpt").toString
    def row(id: Long, h: Int, m: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00"))
    def stage(name: String, rows: Seq[(Long, java.sql.Timestamp)]): Unit = {
      val tmp = Files.createTempDirectory("dedupwm-stage").toString + "/w"
      rows.toDF("event_id", "ts").coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, java.nio.file.Paths.get(s"$srcDir/$name"))
      ()
    }
    stage("batch1.parquet", Seq(row(1, 0, 30), row(2, 2, 30)))
    val schema = spark.read.parquet(srcDir).schema
    val q = Streaming.dedupedEvents(spark, srcDir, schema, delay = "1 hour")
      .select(col("event_id"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    q.processAllAvailable() // watermark advances to 02:30 − 1h = 01:30
    // id 2 redelivered INSIDE the delay → suppressed by live state;
    // id 4 at 00:40 is BELOW the watermark → dropped as late (its state,
    // had it existed, would already be evicted — the two rules expire
    // together, which is exactly why the guarantee has no gap);
    // id 3 is new → emitted
    stage("batch2.parquet", Seq(row(2, 2, 30), row(4, 0, 40), row(3, 3, 30)))
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq.sorted
    assert(got == Seq(1L, 2L, 3L))
  }

  test("native session windows: streaming sessions finalize at the watermark ≡ batch st3") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("sess-src").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    val outDir = Files.createTempDirectory("sess-out").toString + "/o"
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(srcDir).schema
    def runOnce(): Unit = {
      val q = Streaming.sessionizedEventSums(spark, srcDir, schema)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    // a far-future "closer" row pushes the watermark past every real
    // session so append mode finalizes them all; its own session stays
    // open (excluded below)
    val closerTs = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
    val closer = Seq((-1L, closerTs, -1L, "x", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(schema.fieldNames.map(col): _*)
    val tmp = Files.createTempDirectory("sess-stage").toString + "/w"
    closer.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, java.nio.file.Paths.get(s"$srcDir/closer.parquet"))
    runOnce()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.get(1).toString, r.get(2).toString, r.getLong(3), r.getDouble(4))
    val got = spark.read.parquet(outDir)
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .filter(col("user_id") >= 0)
      .collect().map(key).toSet
    val batch = SparkEntry.queries("st3_session_window")(spark, "/root/testdata/sf0.001")
      .collect().map(key).toSet
    assert(got == batch, s"stream sessions != batch: missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
  }

  test("stream-stream interval join (click attribution) ≡ batch st4; inner matches emit without watermark closure") {
    val srcDir = Files.createTempDirectory("attr-src").toString
    val ckpt = Files.createTempDirectory("attr-ckpt").toString
    val outDir = Files.createTempDirectory("attr-out").toString + "/o"
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(s"$srcDir/events.parquet"))
    val schema = spark.read.parquet(srcDir).schema
    val q = Streaming.clickAttribution(spark, srcDir, schema)
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("parquet").option("path", outDir).start()
    q.processAllAvailable(); q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val got = spark.read.parquet(outDir)
      .select("user_id", "view_id", "click_id", "gap_us")
      .collect().map(key).toSet
    val batch = SparkEntry.queries("st4_interval_join")(spark, "/root/testdata/sf0.001")
      .select("user_id", "view_id", "click_id", "gap_us")
      .collect().map(key).toSet
    assert(batch.nonEmpty, "fixture lost its planted view→click pairs")
    // INNER join matches emit as both sides arrive — no closer row needed
    // (the watermark bounds state EVICTION, not emission)
    assert(got == batch, s"stream != batch: missing=${(batch -- got).take(3)} extra=${(got -- batch).take(3)}")
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

  test("stateful host limiter on a mass-skewed host matches sorted-take semantics (bounded-heap path)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val out = Streaming.statefulHostLimiter(input.toDS(), budgetPerBatch = 3)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("limiter_skew").start()
    // one Zipf-hot host owning 5000 urls of the batch (the shape that made
    // the old toVector.sorted hold a whole batch slice in one task), urls
    // arriving in REVERSE lexicographic order, plus one cold host
    val hot = (4999 to 0 by -1).map(i => ("hot", f"u$i%05d"))
    input.addData(hot :+ (("cold", "c1")): _*)
    q.processAllAvailable()
    // second batch: grant counter carries across batches
    input.addData(("hot", "a0"), ("hot", "z9"))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("limiter_skew").as[Streaming.GrantDecision].collect()
    val b1hot = rows.filter(r => r.host == "hot" && r.canonical_url.startsWith("u"))
    assert(b1hot.length == 5000, "every url must get a decision row")
    assert(b1hot.count(_.granted) == 3)
    assert(b1hot.filter(_.granted).map(_.canonical_url).sorted.toSeq ==
      Seq("u00000", "u00001", "u00002"),
      "grants must be the lexicographically smallest urls regardless of arrival order")
    assert(b1hot.filter(_.granted).map(_.host_total_granted).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(b1hot.filter(!_.granted).forall(_.host_total_granted == 3L))
    assert(rows.find(_.canonical_url == "c1").exists(_.granted))
    val b2 = rows.filter(r => Set("a0", "z9")(r.canonical_url))
    assert(b2.forall(_.granted) && b2.map(_.host_total_granted).sorted.toSeq == Seq(4L, 5L))
  }

  test("limiter drain contract: emitted rows never ahead of state, even on partial drains") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def freshState() = TestGroupState.create[Streaming.HostState](
      Optional.empty[Streaming.HostState](), GroupStateTimeout.NoTimeout, 1L,
      Optional.empty[Long](), hasTimedOut = false)
    def freshRows() = (9 to 0 by -1).map(i => ("h", s"u$i")).iterator
    // full drain, one pull at a time: after EVERY emitted row the state
    // must already cover it (state ≥ emitted at every output prefix — the
    // invariant a downstream early-exit relies on, since group state
    // commits whatever was last update()d)
    val state = freshState()
    val out = Streaming.limitGroup(2)("h", freshRows(), state)
    var emittedDeferred = 0L
    var emittedGranted = 0L
    while (out.hasNext) {
      val d = out.next()
      if (d.granted) emittedGranted += 1 else emittedDeferred += 1
      assert(state.get.deferred >= emittedDeferred,
        s"state.deferred ${state.get.deferred} behind emitted $emittedDeferred")
      assert(state.get.granted >= emittedGranted)
    }
    assert(state.get == Streaming.HostState(2L, 8L)) // exact totals when fully drained
    // partial drain (downstream stops after 3 rows): state still covers
    // every row that escaped
    val state2 = freshState()
    val out2 = Streaming.limitGroup(2)("h", freshRows(), state2)
    val taken = out2.take(3).toList
    assert(taken.count(!_.granted) <= state2.get.deferred,
      "a partially-drained group left emitted deferrals unaccounted in state")
  }

  test("maintained gate falls back to exact over a seen chain with unkeyed commits") {
    import graft.seen.ShardStore
    import org.apache.spark.sql.functions.lit
    val n = 200L
    val seedsDir = Files.createTempDirectory("seeds-u").toString
    val root = Files.createTempDirectory("streamcrawl-u").toString
    val ckpt = Files.createTempDirectory("ckpt-u").toString
    val shardRoot = Files.createTempDirectory("shardstore-u").toString
    Synth.seedList(spark, n, 2).toDF().write.parquet(s"$seedsDir/seeds")
    val schema = spark.read.parquet(s"$seedsDir/seeds").schema
    val store = Synth.imageDocs(spark, n, 4).toDF()
    // pre-seed the seen table with an UNKEYED commit (batchId=-1) marking
    // half the seeds already seen — e.g. a backfill written outside the
    // streaming loop. Those rows are invisible to readSinceBatch lineage,
    // so the maintained filter could never learn them; the gate must
    // detect the poisoned chain and take the exact path.
    val pre = Synth.seedList(spark, n, 2).toDF()
      .filter(col("seed_rank") < n / 2)
      .select(graft.canon.UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
      .withColumn("first_batch_id", lit(-1L))
    new SnapshotTable(s"$root/seen").commit(pre) // unkeyed
    Streaming.runCrawlStream(spark, s"$seedsDir/seeds", schema, store, root, ckpt,
      budget = 2, numPartitions = 4,
      maintainedShards = Some(new ShardStore(shardRoot, numBuckets = 4, expectedPerShard = 4096)))
    val fetched = new SnapshotTable(s"$root/fetched").read(spark).get
    assert(fetched.count() > 0)
    // exactness held: no pre-seen url was crawled
    assert(fetched.join(pre.select("canonical_url"), Seq("canonical_url"), "left_semi").count() == 0,
      "a url from the unkeyed commit slipped past the gate")
    // and the store did NOT advance over the poisoned chain (advancing
    // would mark it current while permanently missing the unkeyed rows)
    assert(new ShardStore(shardRoot, numBuckets = 4).latestBatch.isEmpty,
      "maintained store advanced despite unkeyed commits on the chain")
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

  test("maintained cuckoo shard store gates the stream identically and self-heals after a lost shard write") {
    import graft.seen.{CuckooSeen, ShardStore}
    val n = 300L
    val seedsDir = Files.createTempDirectory("seeds-m").toString
    val rootA = Files.createTempDirectory("streamcrawl-exact").toString
    val rootB = Files.createTempDirectory("streamcrawl-shard").toString
    val ckptA = Files.createTempDirectory("ckpt-a").toString
    val ckptB = Files.createTempDirectory("ckpt-b").toString
    Synth.seedList(spark, n, 3).toDF().write.parquet(s"$seedsDir/seeds")
    val schema = spark.read.parquet(s"$seedsDir/seeds").schema
    val store = Synth.imageDocs(spark, n, 4).toDF()
    val shardRoot = Files.createTempDirectory("shardstore").toString
    val shards = new ShardStore(shardRoot, numBuckets = 4, expectedPerShard = 4096)

    // run the exact-gated and shard-gated streams over the same input
    Streaming.runCrawlStream(spark, s"$seedsDir/seeds", schema, store, rootA, ckptA,
      budget = 2, numPartitions = 4)
    Streaming.runCrawlStream(spark, s"$seedsDir/seeds", schema, store, rootB, ckptB,
      budget = 2, numPartitions = 4, maintainedShards = Some(shards))

    // late-arriving seed file with overlap → second micro-batch exercises the gate
    Synth.seedList(spark, n * 2, 3).toDF().filter(col("seed_rank") >= n / 2)
      .write.mode("append").parquet(s"$seedsDir/seeds")
    Streaming.runCrawlStream(spark, s"$seedsDir/seeds", schema, store, rootA, ckptA,
      budget = 2, numPartitions = 4)

    // CRASH SIMULATION for the maintained run: every shard version written
    // so far is lost (crash between seen commit and shard write) — heal()
    // must rebuild the delta from first_batch_id lineage, or seen urls
    // would slip past the gate and be crawled twice
    val lostManifests = new java.io.File(shardRoot).listFiles()
      .filter(_.getName.startsWith("manifest-b"))
    assert(lostManifests.nonEmpty, "first run wrote no shard version")
    lostManifests.foreach(_.delete())
    new java.io.File(shardRoot, "blobs").listFiles().foreach { d =>
      Option(d.listFiles()).foreach(_.foreach(_.delete())); d.delete()
    }
    // the healed run forces the PARTITIONED gate shape (limit 0 = "shards
    // too big to broadcast") — both gate shapes must produce the same
    // stream output
    Streaming.runCrawlStream(spark, s"$seedsDir/seeds", schema, store, rootB, ckptB,
      budget = 2, numPartitions = 4, maintainedShards = Some(shards),
      shardBroadcastLimit = 0L)

    val a = new SnapshotTable(s"$rootA/fetched").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    val b = new SnapshotTable(s"$rootB/fetched").read(spark).get
      .select("canonical_url").collect().map(_.getString(0)).toSet
    assert(a == b, s"maintained gate diverged: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    assert(b.size == new SnapshotTable(s"$rootB/fetched").read(spark).get.count(),
      "a url was crawled twice despite the maintained gate")

    // the healed store is complete: every seen url probes positive
    val seenB = new SnapshotTable(s"$rootB/seen").read(spark).get
    val cur = shards.current(spark)
    assert(CuckooSeen.gateNotSeen(seenB.select("canonical_url"), cur, 4).count() == 0)
  }
}
