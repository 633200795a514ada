package graft

import org.apache.spark.sql.functions._

import graft.canon.UrlCanon
import graft.ops.CrawlIndex
import graft.queries.CrawlOpsQueries

/** Crawl-infrastructure operators: SURT keys, CDX shard offsets, trap
  * detection, adaptive politeness, TF-IDF, sitemap ingest. Value-level
  * hand cases here; cross-engine parity is the driver's DuckDB compare.
  */
class CrawlOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("surtKey reverses host labels and keeps path+query") {
    val df = spark.createDataFrame(Seq(
      ("https://www.sub.example.com/a/b.png?x=1", "www.sub.example.com"),
      ("https://example.com/", "example.com"),
      ("https://h3.example.com/img/9_1.png", "h3.example.com")
    )).toDF("cu", "host")
    val got = df.select(UrlCanon.surtKey(col("cu"), col("host")).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "com,example,sub,www)/a/b.png?x=1",
      "com,example)/",
      "com,example,h3)/img/9_1.png"))
  }

  test("surt order makes one domain's urls (incl. subdomains) contiguous") {
    val rows = CrawlOpsQueries.queries("c33_surt_key")(spark, sf)
      .select("surt_key").collect().map(_.getString(0)).sorted.toSeq
    // every h7.example.com key (with or without www) shares the prefix
    val h7 = rows.filter(_.startsWith("com,example,h7)"))
    val h7www = rows.filter(_.startsWith("com,example,h7,www)"))
    assert(h7.nonEmpty && h7www.nonEmpty)
    // in sorted order the h7 block is contiguous: no foreign key between
    // the first and last com,example,h7 entries
    val block = rows.dropWhile(!_.startsWith("com,example,h7"))
      .takeWhile(_.startsWith("com,example,h7"))
    assert(block.size == h7.size + h7www.size)
  }

  test("cdxOffsets: offsets are the exact running sum of record lengths") {
    val df = spark.createDataFrame(Seq(
      (0L, "a", 10L), (0L, "b", 20L), (0L, "c", 5L),
      (1L, "a", 7L), (1L, "z", 3L)
    )).toDF("shard", "key", "record_len")
    val got = CrawlIndex.cdxOffsets(df, "shard", "record_len", Seq("key"))
      .select("shard", "key", "byte_offset")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, "a", 0L), (0L, "b", 10L), (0L, "c", 30L),
      (1L, "a", 0L), (1L, "z", 7L)))
  }

  test("c34 offsets: per shard, max(offset)+len == sum(len) (no gaps/overlaps)") {
    val idx = CrawlOpsQueries.queries("c34_cdx_index")(spark, sf)
    val bad = idx.groupBy("shard")
      .agg(max(col("byte_offset") + col("record_len")).as("endmax"),
        sum("record_len").as("total"))
      .filter(col("endmax") =!= col("total"))
    assert(bad.count() == 0)
  }

  test("trap detect flags exactly the planted hostnum%7==2 hosts") {
    val got = CrawlOpsQueries.queries("c35_trap_detect")(spark, sf)
      .select("host", "is_trap").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    got.foreach { case (host, trap) =>
      val n = host.stripPrefix("h").takeWhile(_.isDigit).toInt
      assert(trap == (n % 7 == 2), s"$host flagged=$trap")
    }
    assert(got.values.count(identity) > 0)
  }

  test("adaptive delay: hand-checked weighted fold and clamp bounds") {
    val out = CrawlOpsQueries.queries("c36_adaptive_delay")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val d = r.getAs[Long]("delay_ms")
      assert(d >= 100L && d <= 5000L)
      // delay is derived from ewma by the documented clamp arithmetic
      val e = r.getAs[Long]("ewma_fp")
      assert(d == math.max(100L, math.min(5000L, (e / 1000L) * 2)))
    }
    // hand case: one host, latencies known → ewma = weighted mean 8/4/2/1
    val one = spark.createDataFrame(Seq(
      ("https://only.example.com/a1.png", 101L, 0L),
      ("https://only.example.com/a2.png", 102L, 0L),
      ("https://only.example.com/a3.png", 103L, 0L),
      ("https://only.example.com/a4.png", 104L, 0L),
      ("https://only.example.com/a5.png", 105L, 0L)
    )).toDF("url", "seed_rank", "priority")
    // reuse the query shape over a stub frontier via direct arithmetic:
    // most recent 4 are sr 105,104,103,102 → lat (sr%900+50) 155,154,153,152
    // → (8*155 + 4*154 + 2*153 + 1*152) * 1000 / 15
    val expected = (8 * 155 + 4 * 154 + 2 * 153 + 152) * 1000L / 15
    val recent = graft.ops.Sampling.topKWeighted(
      one.select(UrlCanon.hostOf(col("url")).as("host"),
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"), col("seed_rank")),
      "host", "canonical_url", "seed_rank", k = 4)
      .withColumn("latency_ms", col("seed_rank") % 900 + 50)
      .withColumn("w", expr("CASE rk WHEN 1 THEN 8 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END"))
      .groupBy(col("host"))
      .agg(expr("(sum(w * latency_ms) * 1000) DIV sum(w)").as("ewma_fp"))
      .collect()
    assert(recent.head.getAs[Long]("ewma_fp") == expected)
  }

  test("tfidf: a doc-unique term outranks corpus-wide common terms") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha common common common"),
      (1L, "common common beta common"),
      (2L, "common gamma common")
    ).toDF("doc_id", "text")
    val tf = docs
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), expr("tf * ((n_docs * 1000) DIV df)").as("score_fp"))
    val top1 = graft.ops.Sampling.topKWeighted(scored, "doc_id", "term", "score_fp", 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    // unique terms (df=1, idf 3000) beat 'common' (df=3, idf 1000, tf≤3)
    assert(top1 == Map("0" -> "alpha", "1" -> "beta", "2" -> "gamma"))
  }

  test("tfidf plan: per-doc top-3 is window-free (bounded aggregator)") {
    val df = CrawlOpsQueries.queries("t10_tfidf")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"t10 must not plan a window:\n$plan")
  }

  test("sitemap ingest parses loc+lastmod and canonicalizes (port stripped)") {
    val out = CrawlOpsQueries.queries("s3_sitemap_ingest")(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cu = r.getAs[String]("canonical_url")
      assert(!cu.contains(":443"), s"default port must be stripped: $cu")
      assert(cu.startsWith("https://h") && cu.contains("/s/"))
      assert(r.getAs[String]("lastmod") >= "2024-07-01")
    }
    // host h0: months (0+k)%12+1 for k=0..19 → values 1..12 plus 1..8 again;
    // >= '2024-07' keeps months 7..12 once + 7,8 again = 8 entries
    assert(rows.count(_.getAs[String]("host") == "h0.example.com") == 8)
  }

  test("robots parse: section precedence, empty-Disallow drop, crawl-delay") {
    val rows = CrawlOpsQueries.queries("c37_robots_parse")(spark, sf).collect()
    def of(host: String) = rows.filter(_.getAs[String]("host") == host)
    // id 0: %4==0 → no graftbot section → '*' rules + star delay 0%5+1=1
    val h0 = of("h0.example.com")
    assert(h0.forall(_.getAs[String]("agent_used") == "*"))
    assert(h0.map(r => (r.getAs[String]("path_prefix"), r.getAs[Boolean]("allowed"))).toSet ==
      Set(("/img/", false), ("/img/1", true)))
    assert(h0.forall(_.getAs[Int]("crawl_delay") == 1))
    // id 1: graftbot section wins → its rules + its delay 1%3+1=2
    val h1 = of("h1.example.com")
    assert(h1.forall(_.getAs[String]("agent_used") == "graftbot"))
    assert(h1.map(r => (r.getAs[String]("path_prefix"), r.getAs[Boolean]("allowed"))).toSet ==
      Set(("/private/", false), ("/img/", true)))
    assert(h1.forall(_.getAs[Int]("crawl_delay") == 2))
    // id 8: %4==0 (star used) AND %7==1 (star carries an EMPTY Disallow —
    // must be dropped, per the de-facto standard) → exactly 2 rules
    val h8 = of("h8.example.com")
    assert(h8.length == 2 && h8.forall(_.getAs[String]("agent_used") == "*"))
    assert(h8.forall(_.getAs[String]("path_prefix").nonEmpty))
    assert(h8.forall(_.getAs[Int]("crawl_delay") == 4))
  }

  test("host graph rollup equals a from-scratch Scala recomputation") {
    val got = CrawlOpsQueries.queries("g4_host_graph")(spark, sf).collect()
      .map(r => r.getAs[String]("host") ->
        ((r.getAs[Long]("out_deg"), r.getAs[Long]("out_links"),
          r.getAs[Long]("in_deg"), r.getAs[Long]("n_recip")))).toMap
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val raw = ids.flatMap(i => Seq((i % 50, (i * 3 + 1) % 50), (i % 50, (i + 17) % 50)))
      .filter { case (a, b) => a != b }
    val edges = raw.groupBy(identity).map { case (e, xs) => (e, xs.length.toLong) }
    val eset = edges.keySet
    val exp = eset.flatMap { case (a, b) => Seq(a, b) }.map { h =>
      val out = eset.filter(_._1 == h)
      (s"h$h.example.com", (
        out.size.toLong,
        out.toSeq.map(edges).sum,
        eset.count(_._2 == h).toLong,
        out.count { case (a, b) => eset.contains((b, a)) }.toLong))
    }.toMap
    assert(got == exp)
  }

  test("snapshot diff: classification matches the planted delta; idempotent re-run") {
    val q = CrawlOpsQueries.queries("k8_snapshot_diff")
    val first = q(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("change"))).toSet
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val n = ids.max + 1
    val exp =
      ids.filter(_ % 17 == 0).map(i => (i, "deleted")).toSet ++
      ids.filter(i => i % 10 == 0 && i % 17 != 0).map(i => (i, "changed")).toSet ++
      ids.filter(_ % 23 == 0).map(i => (i + n, "added")).toSet
    assert(first == exp)
    // batchId idempotency: a second invocation in the same session reuses
    // the committed chain and returns the identical diff
    val second = q(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("change"))).toSet
    assert(second == first)
  }

  test("hll cardinality: ≤2% per-host and union error; union ≡ whole-set sketch") {
    val est = CrawlOpsQueries.queries("a2_hll_cardinality")(spark, sf).collect()
      .map(r => r.getAs[String]("host") -> r.getAs[Long]("est_distinct")).toMap
    val f = queries.Fixture.frontier(spark, sf).select(
      UrlCanon.hostOf(col("url")).as("host"),
      UrlCanon.canonicalUrl(col("url")).as("cu"))
    val exact = f.groupBy("host").agg(countDistinct(col("cu")).as("n")).collect()
      .map(r => r.getAs[String]("host") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (h, n) =>
      val e = est(h)
      assert(math.abs(e - n) <= math.max(1L, (0.02 * n).toLong),
        s"$h est=$e exact=$n")
    }
    val globalExact = f.select("cu").distinct().count()
    assert(math.abs(est("__all__") - globalExact) <= (0.02 * globalExact).toLong + 1)
    // a union of per-host sketches is NOT bit-identical to one whole-set
    // sketch (DataSketches transitions LIST→SET→HLL at different points
    // along the two paths), but both sit within the sketch's error bound
    // of each other — and repeated evaluation of the SAME rollup shape is
    // deterministic (register maxima don't depend on merge order)
    val direct = f.agg(hll_sketch_estimate(hll_sketch_agg(col("cu"), lit(14))))
      .collect()(0).getLong(0)
    assert(math.abs(est("__all__") - direct) <= (0.02 * globalExact).toLong + 1)
    val again = CrawlOpsQueries.queries("a2_hll_cardinality")(spark, sf).collect()
      .map(r => r.getAs[String]("host") -> r.getAs[Long]("est_distinct")).toMap
    assert(again == est)
  }

  test("a3 incremental HLL fold lands on the one-shot a2 estimates") {
    // DataSketches HLL union is register-wise max, so folding the corpus
    // in per-batch sketches reproduces the one-shot PER-HOST estimates
    // exactly. The global rollup is a union OF union outputs — those are
    // serialized in the union's own register encoding and estimated by
    // the composite (non-HIP) path, so it can round a fraction of a
    // percent away from a2's single-level union (observed: 5953 vs 5951
    // on ~6k distinct); per-host is exact, global is bounded.
    def est(name: String): Map[String, Long] =
      CrawlOpsQueries.queries(name)(spark, sf).collect()
        .map(r => r.getAs[String]("host") -> r.getAs[Long]("est_distinct")).toMap
    val a2 = est("a2_hll_cardinality")
    val a3 = est("a3_hll_update")
    assert(a3.filterNot(_._1 == "__all__") == a2.filterNot(_._1 == "__all__"))
    val (g2, g3) = (a2("__all__").toDouble, a3("__all__").toDouble)
    assert(math.abs(g3 - g2) / g2 < 0.005, s"global rollup drifted: $g3 vs $g2")
  }

  test("letterbox kernel: pad→detect round-trips exact widths, all formats") {
    import graft.imagecodec.ImageCodec
    val w = 16; val h = 12
    val px = ImageCodec.syntheticPixels(0xbeefL, w, h)
    for (fmt <- Seq("bmp", "png", "xjpg")) {
      val enc = ImageCodec.encode(px, w, h, fmt)
      // zero-border image: nothing detected (noise rows are not uniform)
      assert(ImageCodec.letterboxOf(enc) == 0, fmt)
      // fully uniform image: no border reported (there is no content to
      // crop TO), so crop(detect(x)) stays total instead of throwing
      val flat = ImageCodec.encode(Array.fill(w * h)(7.toByte), w, h, fmt)
      assert(ImageCodec.letterboxOf(flat) == 0, s"$fmt fully-uniform")
      assert(java.util.Arrays.equals(
        ImageCodec.cropEncoded(flat, ImageCodec.letterboxOf(flat)), flat), fmt)
      for ((t, b, l, r) <- Seq((1, 0, 0, 0), (3, 2, 1, 0), (2, 2, 4, 4))) {
        val packed = ImageCodec.packBorders(t, b, l, r)
        val padded = ImageCodec.padEncoded(enc, packed)
        assert(ImageCodec.letterboxOf(padded) == packed, s"$fmt $t/$b/$l/$r")
        // crop dims recoverable: padded dims minus detected borders
        val (pw, ph) = ImageCodec.decodeDims(padded)
        assert(pw - l - r == w && ph - t - b == h, fmt)
        // crop is the exact inverse of pad — bit-for-bit, even for the
        // lossy codec (its quantizer is a projection)
        assert(java.util.Arrays.equals(
          ImageCodec.cropEncoded(padded, ImageCodec.letterboxOf(padded)), enc),
          s"$fmt $t/$b/$l/$r crop!=original")
      }
    }
  }

  test("dot-segment removal: hand cases + idempotence") {
    import spark.implicits._
    val in = Seq(
      "/a/./b/../c.png",
      "/a/b/c/../../x.png",
      "/./a/../img/9.png",
      "/img/plain.png",
      "/a/././b/../../c/d.png").toDF("p")
    val got = in.select(UrlCanon.removeDotSegments(col("p")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("/a/c.png", "/a/x.png", "/img/9.png", "/img/plain.png", "/c/d.png"))
    // normalizing an already-normal path is the identity
    val twice = in.select(UrlCanon.removeDotSegments(
      UrlCanon.removeDotSegments(col("p"))).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == got)
  }

  test("lineage metrics reproduce the planted commit sizes") {
    val rows = CrawlOpsQueries.queries("k9_lineage_metrics")(spark, sf).collect()
      .sortBy(_.getAs[Long]("snapshot_id"))
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val base = ids.length.toLong
    val delta = ids.count(i => i % 10 == 0 && i % 17 != 0) +
      ids.count(_ % 17 == 0) + ids.count(_ % 23 == 0)
    assert(rows.map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("rows_added"),
      r.getAs[Long]("rows_total"))).toSeq ==
      Seq((1L, base, base), (2L, delta.toLong, base + delta)))
  }
}
