package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.canon.UrlCanon
import graft.ops.{CrawlIndex, Sampling}
import graft.tableio.SnapshotTable

/** Crawl-infrastructure operators beyond the scheduler core: archive-grade
  * indexing (SURT keys, CDX shard offsets), frontier hygiene (crawl-trap
  * detection, latency-adaptive politeness), sitemap ingest, and TF-IDF
  * term scoring. Same contract as the other query modules: every entry is
  * value-portable and carries a DuckDB twin (integer-only arithmetic, the
  * `DIV`/`//` pair for division, shared canon SQL).
  */
object CrawlOpsQueries {

  /** SQL twin of [[UrlCanon.surtKey]] over (canonical, host) expressions. */
  private def surtSql(canonical: String, host: String): String =
    s"concat(array_to_string(list_reverse(string_split($host, '.')), ','), ')', " +
      s"regexp_replace($canonical, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', ''))"

  /** Session-scoped snapshot-table root for k8 (same reclamation contract
    * as the band store: owner pid in the DIRECTORY NAME so
    * Bench.sweepStaleStores reclaims it the moment this JVM dies). */
  /** Session-scoped pid-owned store root (the band-store reclamation
    * contract: owner pid in the directory name so Bench.sweepStaleStores
    * reclaims it the moment this JVM dies). */
  private def storePath(s: SparkSession, dir: String, kind: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val sess = org.apache.spark.sql.graftbridge.Bridge.sessionUUID(s)
    s"/tmp/graft-store/${kind}_pid${ProcessHandle.current().pid()}_${tag}_$sess"
  }

  private def snapDiffPath(s: SparkSession, dir: String, suffix: String = ""): String =
    storePath(s, dir, "snapdiff") + suffix

  /** The k8/k9 snapshot fixture: a two-commit merge-on-read chain (batch 1
    * = version-1 base rows; batch 2 = the planted delta: %10 changed, %17
    * tombstoned, %23 appended past max id). batchId idempotency makes this
    * safe to call from every consumer in any order — the first call in a
    * session commits, the rest reuse the chain. */
  private def ensureSnapDiffTable(s: SparkSession, dir: String,
      suffix: String = ""): SnapshotTable = {
    val t = new SnapshotTable(snapDiffPath(s, dir, suffix))
    val docs = Fixture.documents(s, dir)
    val base = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("content"),
      lit(1L).as("version"), lit(false).as("tombstone"))
    val withN = docs.crossJoin(broadcast(docs.agg((max("doc_id") + 1).as("__n"))))
    val changed = docs.filter(col("doc_id") % 10 === 0 && col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        md5(concat(col("text"), lit("v2")).cast("binary")).as("content"),
        lit(2L).as("version"), lit(false).as("tombstone"))
    val deleted = docs.filter(col("doc_id") % 17 === 0)
      .select(col("doc_id"), lit(null).cast("string").as("content"),
        lit(2L).as("version"), lit(true).as("tombstone"))
    val added = withN.filter(col("doc_id") % 23 === 0)
      .select((col("doc_id") + col("__n")).as("doc_id"),
        md5(concat(col("text"), lit("new")).cast("binary")).as("content"),
        lit(2L).as("version"), lit(false).as("tombstone"))
    t.commit(base, batchId = 1L)
    t.commit(changed.unionByName(deleted).unionByName(added), batchId = 2L)
    t
  }

  /** Latest-version state of a merge-on-read snapshot chain: per key, the
    * highest-version row wins; tombstones delete. One map-side-combined
    * hash agg — no window, no per-key sort. */
  private def mergeOnRead(versions: DataFrame): DataFrame =
    versions.groupBy(col("doc_id"))
      .agg(expr("max_by(content, version)").as("content"),
        expr("max_by(tombstone, version)").as("tombstone"))
      .filter(!col("tombstone"))
      .select(col("doc_id"), col("content"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SURT sort key (web-archive CDX convention): host labels reversed so
    // a domain and its subdomains share one key prefix — domain-range
    // scans over a 100 TB capture index become contiguous (partition-
    // prunable) key ranges. The frontier is re-messed with a `www.` label
    // on half the rows so 3- and 4-label hosts both exercise the reversal.
    "c33_surt_key" -> ((s, dir) => {
      val u = concat(lit("https://"),
        when(col("seed_rank") % 2 === 0, lit("www.")).otherwise(lit("")),
        expr("substring(url, 9)"))
      // distinct on the canonical url ALONE — host is functionally
      // determined by it (hostOf(canonical) ≡ hostOf(raw): lowercasing
      // and default-port stripping already applied), so the exchange
      // carries one string per row instead of two and the host kernel
      // runs once per DISTINCT row, after the shuffle (guide §2.3)
      Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(u).as("canonical_url"))
        .distinct()
        .select(col("canonical_url"),
          UrlCanon.surtKey(col("canonical_url"),
            UrlCanon.hostOf(col("canonical_url"))).as("surt_key"))
    }),

    // CDX shard offset index: dedup the frontier to records, assign each
    // to a shard, sort within shard by SURT key, and compute each record's
    // byte seek position as the running sum of preceding record lengths —
    // one shuffle on the (writer-controlled, unskewable) shard key, and
    // the in-partition sort is the order the shard file must be written
    // in anyway (see [[graft.ops.CrawlIndex]]).
    "c34_cdx_index" -> ((s, dir) => {
      // grouped on the canonical url alone — host is functionally
      // determined by it (see c33), so the aggregation exchange carries
      // one string per row and the host derivation runs post-shuffle
      val recs = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"), col("seed_rank"))
        .groupBy(col("canonical_url"))
        .agg(min(col("seed_rank")).as("sr"))
        .select(col("canonical_url"),
          UrlCanon.surtKey(col("canonical_url"),
            UrlCanon.hostOf(col("canonical_url"))).as("surt_key"),
          (col("sr") % 8).as("shard"),
          (lit(120L) + length(col("canonical_url")).cast("long")).as("record_len"))
      CrawlIndex.cdxOffsets(recs, "shard", "record_len",
        Seq("surt_key", "canonical_url"))
    }),

    // Crawl-trap detection — the frontier-hygiene gate that stops a
    // calendar/faceted-nav trap from eating a host's politeness budget:
    // per-host path-depth profile, flagging hosts where >10% of observed
    // urls sit ≥8 path segments deep. Trap urls are planted on hosts
    // h2,h9,h16,… (hostnum % 7 = 2) as /cal/p/p/…/x.png with arithmetic
    // depth, so ground truth is closed-form for the oracle. Row-local
    // derivation + one host-keyed agg with map-side partials.
    "c35_trap_detect" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("cu"),
          UrlCanon.hostOf(col("url")).as("host"), col("seed_rank"))
        .withColumn("hostnum", regexp_extract(col("host"), "^h([0-9]+)", 1).cast("int"))
      val path = when(col("hostnum") % 7 === 2 && col("seed_rank") % 3 === 0,
          concat(lit("/cal"), expr("repeat('/p', CAST(seed_rank % 12 AS INT))"), lit("/x.png")))
        .otherwise(regexp_replace(col("cu"), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""))
      f.select(col("host"), path.as("p"))
        .withColumn("depth", expr("length(p) - length(replace(p, '/', ''))"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"),
          max(col("depth")).cast("long").as("max_depth"),
          sum(when(col("depth") >= 8, 1L).otherwise(0L)).as("n_deep"))
        .withColumn("is_trap", col("n_deep") * 10 > col("n_urls"))
    }),

    // Latency-adaptive politeness: per host, the 4 most recent fetches
    // (by seed_rank, via the bounded top-k aggregator — O(k) state per
    // host, map-side partials, no per-host window sort even for a
    // Zipf-hot host) are folded into an exponentially-weighted latency
    // (weights 8/4/2/1, fixed-point ×1000, integer-exact) and the next
    // crawl delay is 2× that, clamped to [100, 5000] ms.
    "c36_adaptive_delay" -> ((s, dir) => {
      val cand = Fixture.frontier(s, dir).select(
        UrlCanon.hostOf(col("url")).as("host"),
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
        col("seed_rank"))
      val recent = Sampling.topKWeighted(cand, "host", "canonical_url", "seed_rank", k = 4)
        .withColumn("latency_ms", col("seed_rank") % 900 + 50)
        .withColumn("w", expr("CASE rk WHEN 1 THEN 8 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END"))
      recent.groupBy(col("host"))
        .agg(expr("(sum(w * latency_ms) * 1000) DIV sum(w)").as("ewma_fp"))
        .select(col("host"), col("ewma_fp"),
          greatest(lit(100L), least(lit(5000L), expr("(ewma_fp DIV 1000) * 2"))).as("delay_ms"))
    }),

    // TF-IDF top-terms per document (the keyword/feature extraction step
    // a training-data pipeline runs for quality filters and topic mixes).
    // Integer idf surrogate (n_docs*1000 DIV df) keeps it cross-engine
    // exact. Scale shape: tf is one (doc,term) agg, df reuses tf (already
    // distinct per doc) with a term-keyed agg, the doc count is a
    // broadcast scalar, and the per-doc top-3 is the bounded top-k
    // aggregator — no window sort over a long document's term list.
    "t10_tfidf" -> ((s, dir) => {
      val docs = Fixture.documents(s, dir)
      // PERSISTED: df derives from tf, but Catalyst has no common-subplan
      // elimination, so without the persist the corpus is tokenized and
      // (doc,term)-aggregated TWICE (two full scans — the dominant cost at
      // 100 TB). CacheManager dedupes the persist call by plan, so repeated
      // invocations share one entry; MEMORY_AND_DISK spills rather than
      // recomputes when tf outgrows executor memory.
      val tf = docs
        .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
        .filter(col("term") =!= "")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      val scored = tf.join(dfreq, Seq("term")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          expr("tf * ((n_docs * 1000) DIV df)").as("score_fp"))
      Sampling.topKWeighted(scored, "doc_id", "term", "score_fp", k = 3)
    }),

    // Sitemap ingest — the other frontier seed source next to outlink
    // extraction (c26): per-host sitemap XML (constructed deterministically
    // in-row: sequence+transform, shuffle-free) is parsed back with
    // codegen'd regex builtins (<url> blocks → loc/lastmod), recency-
    // filtered, and canonicalized into frontier candidates. The oracle
    // rebuilds the same XML and parses it with ITS OWN regex engine, so a
    // green row proves the parse, not the fixture.
    "s3_sitemap_ingest" -> ((s, dir) => {
      val hosts = s.range(0, 50).select(
        concat(lit("h"), col("id").cast("string"), lit(".example.com")).as("host"),
        col("id"))
      val xml = concat(lit("<urlset>"),
        expr("""array_join(transform(sequence(0, 19), k ->
          concat('<url><loc>https://', host, ':443/s/', CAST(k AS STRING),
                 '.png</loc><lastmod>2024-',
                 lpad(CAST((id + k) % 12 + 1 AS STRING), 2, '0'),
                 '-01</lastmod></url>')), '')"""),
        lit("</urlset>"))
      hosts.select(col("host"), xml.as("xml"))
        .select(col("host"),
          explode(expr("regexp_extract_all(xml, '<url>(.*?)</url>', 1)")).as("entry"))
        .select(col("host"),
          expr("regexp_extract(entry, '<loc>([^<]*)</loc>', 1)").as("loc"),
          expr("regexp_extract(entry, '<lastmod>([^<]*)</lastmod>', 1)").as("lastmod"))
        .filter(col("lastmod") >= lit("2024-07-01"))
        .select(col("host"), UrlCanon.canonicalUrl(col("loc")).as("canonical_url"),
          col("lastmod"))
    }),

    // robots.txt PARSER (c25 is the gate; this is the step that produces
    // its rules dimension from raw fetched robots.txt text): per-host
    // deterministic robots.txt with a `*` section and (on 3/4 of hosts) a
    // `graftbot` section; the parser selects the bot's own section with
    // fallback to `*` (the real precedence rule), extracts Allow/Disallow
    // prefixes (empty-path Disallow dropped, per the de-facto standard)
    // and the section's Crawl-delay. Section isolation + line filtering
    // are row-local regex/higher-order builtins — a robots file is one
    // small string per host, so the parse never shuffles.
    "c37_robots_parse" -> ((s, dir) => {
      val h = s.range(0, 50).select(
        concat(lit("h"), col("id").cast("string"), lit(".example.com")).as("host"),
        col("id"))
      val starRules = concat(lit("Disallow: /img/\nAllow: /img/1"),
        when(col("id") % 7 === 1, lit("\nDisallow:")).otherwise(lit("")))
      val txt = concat(
        lit("User-agent: *\n"), starRules,
        lit("\nCrawl-delay: "), (col("id") % 5 + 1).cast("string"),
        when(col("id") % 4 =!= 0, concat(
          lit("\n\nUser-agent: graftbot\nDisallow: /private/\nAllow: /img/\nCrawl-delay: "),
          (col("id") % 3 + 1).cast("string"))).otherwise(lit("")))
      val withTxt = h.select(col("host"), txt.as("txt"))
      val gsec = regexp_extract(col("txt"), "(?s)User-agent: graftbot\\n(.*?)(\\n\\n|$)", 1)
      val ssec = regexp_extract(col("txt"), "(?s)User-agent: \\*\\n(.*?)(\\n\\n|$)", 1)
      withTxt
        .withColumn("agent_used", when(gsec =!= "", lit("graftbot")).otherwise(lit("*")))
        .withColumn("sec", when(gsec =!= "", gsec).otherwise(ssec))
        .withColumn("crawl_delay",
          regexp_extract(col("sec"), "Crawl-delay: ([0-9]+)", 1).cast("int"))
        .select(col("host"), col("agent_used"), col("crawl_delay"),
          explode(filter(split(col("sec"), "\\n"),
            l => l.rlike("^(Allow|Disallow): .+"))).as("line"))
        .select(col("host"), col("agent_used"),
          regexp_extract(col("line"), "^(?:Allow|Disallow): (.*)$", 1).as("path_prefix"),
          col("line").startsWith("Allow:").as("allowed"),
          col("crawl_delay"))
    }),

    // Host-level link-graph rollup — the spam/mirror-detection signal a
    // frontier scorer consumes: page edges aggregate once into a host
    // graph (at 100 TB: trillions of page edges → millions of host rows,
    // ONE map-side-combined shuffle), then degree and reciprocity stats
    // are host-scale operations (the reciprocity check is a self SEMI
    // join on the aggregated edge list, never on page edges).
    "g4_host_graph" -> ((s, dir) => {
      val ids = Fixture.documents(s, dir).select(col("doc_id"))
      val e0 = ids.select((col("doc_id") % 50).as("s"), ((col("doc_id") * 3 + 1) % 50).as("d"))
        .unionByName(ids.select((col("doc_id") % 50).as("s"), ((col("doc_id") + 17) % 50).as("d")))
        .filter(col("s") =!= col("d"))
      val edges = e0.groupBy(col("s"), col("d")).agg(count(lit(1)).as("n_links"))
      val recip = edges.join(edges.select(col("d").as("s"), col("s").as("d")),
        Seq("s", "d"), "left_semi")
      val outd = edges.groupBy(col("s").as("hid"))
        .agg(count(lit(1)).as("out_deg"), sum(col("n_links")).as("out_links"))
      val ind = edges.groupBy(col("d").as("hid")).agg(count(lit(1)).as("in_deg"))
      val rc = recip.groupBy(col("s").as("hid")).agg(count(lit(1)).as("n_recip"))
      outd.join(ind, Seq("hid"), "full_outer").join(rc, Seq("hid"), "full_outer")
        .select(
          concat(lit("h"), col("hid").cast("string"), lit(".example.com")).as("host"),
          coalesce(col("out_deg"), lit(0L)).as("out_deg"),
          coalesce(col("out_links"), lit(0L)).as("out_links"),
          coalesce(col("in_deg"), lit(0L)).as("in_deg"),
          coalesce(col("n_recip"), lit(0L)).as("n_recip"))
    }),

    // Snapshot time-travel DIFF over the merge-on-read chain — "what
    // changed between snapshot v1 and HEAD": base state committed as
    // version-1 rows, a delta commit (changed / tombstoned / added rows,
    // all planted arithmetically so the oracle is closed-form) as
    // version-2; both snapshots time-travel-read from the manifest chain
    // and reconstructed by [[mergeOnRead]] (max_by hash agg, window-free),
    // then classified added/deleted/changed via one full-outer join. This
    // gives the snapshot I/O layer (S8/K1) an ORACLE-CHECKED surface, not
    // just specs. At scale the append-only chain also supports the O(delta)
    // shortcut (readSinceBatch) — the full-outer shape here is the general
    // any-two-snapshots case. Commits are batchId-idempotent, so repeated
    // invocations in one session reuse the table.
    "k8_snapshot_diff" -> ((s, dir) => {
      val t = ensureSnapDiffTable(s, dir)
      val v1 = t.headId.map(t.chain).get.find(_.batchId == 1L).get.id
      val s1 = mergeOnRead(t.read(s, Some(v1)).get).withColumnRenamed("content", "c1")
      val s2 = mergeOnRead(t.read(s, None).get).withColumnRenamed("content", "c2")
      s1.join(s2, Seq("doc_id"), "full_outer")
        .withColumn("change", when(col("c1").isNull, lit("added"))
          .when(col("c2").isNull, lit("deleted"))
          .when(col("c1") =!= col("c2"), lit("changed")))
        .filter(col("change").isNotNull)
        .select(col("doc_id"), col("change"), col("c2").as("content"))
    }),

    // Mergeable cardinality sketch (Apache DataSketches HLL via Spark's
    // native hll_sketch_agg/hll_union_agg): per-host distinct-url
    // estimates plus the global union — the frontier-metrics shape at
    // 10^10 urls, where exact countDistinct would shuffle every url and
    // the sketch shuffles ~KBs per host with map-side combine; sketches
    // are register-max structures, so estimates are merge-order-
    // independent (deterministic) and host sketches roll up to the global
    // without touching the data again. No DuckDB twin exists for the
    // DataSketches register layout → rows-only at the driver; value
    // properties (≤2% error at lgK=14, union within the bound of a
    // whole-set sketch, deterministic re-evaluation) are CrawlOpsSpec's
    // job.
    "a2_hll_cardinality" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir).select(
        UrlCanon.hostOf(col("url")).as("host"),
        UrlCanon.canonicalUrl(col("url")).as("cu"))
      val perHost = f.groupBy(col("host")).agg(hll_sketch_agg(col("cu"), lit(14)).as("sk"))
      perHost.select(col("host"), hll_sketch_estimate(col("sk")).as("est_distinct"))
        .unionByName(perHost.agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
          .select(lit("__all__").as("host"),
            hll_sketch_estimate(col("sk")).as("est_distinct")))
    }),

    // Incremental cardinality-sketch maintenance — the eighth maintenance
    // leg (seen shards, band index, cluster labels, quantiles, IVF lists,
    // snapshot chain, compaction — and now the frontier-metrics sketches):
    // the corpus arrives in TWO crawl batches; each batch is sketched
    // per-host (O(batch) scan) and FOLDED into the stored register table
    // with hll_union_agg (O(hosts) rows — KBs — never a corpus re-scan).
    // DataSketches HLL union is register-wise max, so fold order cannot
    // change the registers: the batched fold lands on exactly the one-shot
    // a2 estimates per host (CrawlOpsSpec asserts full per-host equality;
    // the global rollup — a union of union outputs — estimates through the
    // composite path and may round a fraction of a percent off a2's
    // single-level union). Output schema = a2's, rows-only at the driver
    // like a2 (no DuckDB twin for the register layout).
    "a3_hll_update" -> ((s, dir) => {
      val path = storePath(s, dir, "hllreg")
      val f = Fixture.frontier(s, dir).select(
        UrlCanon.hostOf(col("url")).as("host"),
        UrlCanon.canonicalUrl(col("url")).as("cu"),
        col("seed_rank"))
      for (k <- 0 until 2) {
        val batch = f.filter(col("seed_rank") % 2 === k)
          .groupBy(col("host")).agg(hll_sketch_agg(col("cu"), lit(14)).as("sk"))
        val merged =
          if (k == 0) batch
          else s.read.parquet(s"${path}_v0").unionByName(batch)
            .groupBy(col("host")).agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
        merged.write.mode("overwrite").parquet(s"${path}_v$k")
      }
      val perHost = s.read.parquet(s"${path}_v1")
      perHost.select(col("host"), hll_sketch_estimate(col("sk")).as("est_distinct"))
        .unionByName(perHost.agg(hll_union_agg(col("sk"), lit(false)).as("sk"))
          .select(lit("__all__").as("host"),
            hll_sketch_estimate(col("sk")).as("est_distinct")))
    }),

    // Letterbox detect + crop — the per-image hygiene step a training
    // pipeline runs before resize (black bars dilute every downstream
    // pixel statistic): images are letterboxed with planted per-id border
    // widths (pad_image kernel, top ≥ 1 so the corner anchors the border
    // value), then the letterbox kernel must recover the exact widths and
    // the crop dims from the BYTES alone. Both kernels are codegen'd and
    // row-local — bytes never shuffle (the m1/m3 posture), and the lossy
    // xjpg path holds because its quantizer is per-value (uniform borders
    // stay uniform through a re-encode).
    "m4_letterbox_crop" -> ((s, dir) => {
      val n = Fixture.documents(s, dir).count()
      val g = graft.functions.graftfns
      val packed = ((col("id") % 4 + 1) * 16777216L +
        ((col("id") + 1) % 4) * 65536L +
        ((col("id") + 2) % 4) * 256L +
        (col("id") + 3) % 4).cast("int")
      graft.model.Synth.imageDocs(s, n, 32).toDF()
        .select(substring(col("image_id"), 4, 8).cast("long").as("id"), col("bytes"))
        .withColumn("padded", g.padImage(col("bytes"), packed))
        .select(col("id"),
          g.letterbox(col("padded")).as("det"),
          g.decodeWidth(col("padded")).as("pw"),
          g.decodeHeight(col("padded")).as("ph"))
        .select(col("id"),
          expr("det DIV 16777216").as("b_top"),
          expr("(det DIV 65536) % 256").as("b_bottom"),
          expr("(det DIV 256) % 256").as("b_left"),
          expr("det % 256").as("b_right"),
          expr("CAST(pw AS BIGINT) - (det DIV 256) % 256 - det % 256").as("crop_w"),
          expr("CAST(ph AS BIGINT) - det DIV 16777216 - (det DIV 65536) % 256").as("crop_h"))
    }),

    // RFC-3986 dot-segment normalization — without it `/a/./b/../c` and
    // `/a/c` are distinct frontier keys and the seen gate re-fetches every
    // alias. Five planted alias shapes (clean, `/./`, one `/../`, a nested
    // double `/../../`, a leading `/./` + `/../`) normalize through the
    // bounded 8-pass rewrite (UrlCanon.removeDotSegments — codegen'd
    // Column regex, row-local, shuffle-free; the oracle runs the IDENTICAL
    // passes).
    "c38_dot_segments" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir)
      val sr = col("seed_rank")
      val fn = concat(sr.cast("string"), lit(".png"))
      val raw = when(sr % 5 === 0, concat(lit("/img/"), fn))
        .when(sr % 5 === 1, concat(lit("/img/./"), fn))
        .when(sr % 5 === 2, concat(lit("/img/x/../"), fn))
        .when(sr % 5 === 3, concat(lit("/a/b/c/../../"), fn))
        .otherwise(concat(lit("/./a/../img/"), fn))
      f.select(sr.as("seed_rank"), raw.as("raw_path"))
        .withColumn("norm_path", graft.canon.UrlCanon.removeDotSegments(col("raw_path")))
    }),

    // Per-commit lineage metrics off the snapshot manifest chain (the
    // north rule's "per-partition lineage + metrics"): each commit's row
    // count is captured by `observe` ON the commit's own write action and
    // recorded in its manifest — this query reads the chain back and must
    // reproduce the planted commit sizes in closed form. Manifest walks
    // are O(commits) driver work, never a data scan.
    // Snapshot compaction (Iceberg rewrite_data_files + expire_snapshots):
    // the k8 merge-on-read chain is materialized ONCE into a single rebase
    // snapshot (parent −1, version collapsed, tombstones dropped) and HEAD
    // swapped to it — a k-commit chain costs every reader k file sets per
    // scan, the compacted table exactly one; old snapshots stay
    // time-travel-readable until expireSnapshots reclaims them as an
    // orphaned branch. The RESULT reads the compacted table straight off
    // HEAD with no merge agg (that being the point) — green proves the
    // rewrite preserved the exact MOR state the chain encoded. A dedicated
    // "_k10" table keeps the shared k8/k9 fixture chain intact, and the
    // compaction's own batchId makes re-invocation a no-op.
    "k10_snapshot_compact" -> ((s, dir) => {
      val t = ensureSnapDiffTable(s, dir, "_k10")
      val compacted = t.read(s, None).get
        .groupBy(col("doc_id"))
        .agg(expr("max_by(content, version)").as("content"),
          max(col("version")).as("version"),
          expr("max_by(tombstone, version)").as("tombstone"))
        .filter(!col("tombstone"))
      t.compact(compacted, batchId = 3L)
      t.read(s, None).get.select(col("doc_id"), col("content"))
    }),

    "k9_lineage_metrics" -> ((s, dir) => {
      val t = ensureSnapDiffTable(s, dir)
      val chain = t.headId.map(t.chain).getOrElse(Nil).sortBy(_.id)
      val cum = chain.scanLeft(0L)(_ + _.rows).tail
      import s.implicits._
      chain.zip(cum).map { case (m, tot) => (m.id, m.batchId, m.rows, tot) }
        .toDF("snapshot_id", "batch_id", "rows_added", "rows_total")
    })
  )

  val oracle: Map[String, String] = Map(

    "c33_surt_key" ->
      s"""WITH ${OracleSql.frontierCte},
         |u AS (
         |  SELECT concat('https://',
         |    CASE WHEN seed_rank % 2 = 0 THEN 'www.' ELSE '' END,
         |    substring(url, 9)) AS url
         |  FROM frontier),
         |c AS (
         |  SELECT DISTINCT ${OracleSql.canonSql("url")} AS canonical_url,
         |    ${OracleSql.hostSql("url")} AS host
         |  FROM u)
         |SELECT canonical_url,
         |  ${surtSql("canonical_url", "host")} AS surt_key
         |FROM c""".stripMargin,

    "c34_cdx_index" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |g AS (
         |  SELECT canonical_url, host, min(seed_rank) AS sr
         |  FROM cfrontier GROUP BY 1, 2),
         |r AS (
         |  SELECT canonical_url,
         |    ${surtSql("canonical_url", "host")} AS surt_key,
         |    sr % 8 AS shard,
         |    CAST(120 + length(canonical_url) AS BIGINT) AS record_len
         |  FROM g)
         |SELECT canonical_url, surt_key, shard, record_len,
         |  CAST(coalesce(sum(record_len) OVER (
         |    PARTITION BY shard ORDER BY surt_key, canonical_url
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS byte_offset
         |FROM r""".stripMargin,

    "c35_trap_detect" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |p AS (
         |  SELECT host,
         |    CASE WHEN CAST(regexp_extract(host, '^h([0-9]+)', 1) AS INTEGER) % 7 = 2
         |              AND seed_rank % 3 = 0
         |         THEN concat('/cal', repeat('/p', CAST(seed_rank % 12 AS INTEGER)), '/x.png')
         |         ELSE regexp_replace(canonical_url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', '')
         |    END AS p
         |  FROM cfrontier),
         |d AS (SELECT host, length(p) - length(replace(p, '/', '')) AS depth FROM p)
         |SELECT host, count(*) AS n_urls,
         |  CAST(max(depth) AS BIGINT) AS max_depth,
         |  CAST(sum(CASE WHEN depth >= 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_deep,
         |  sum(CASE WHEN depth >= 8 THEN 1 ELSE 0 END) * 10 > count(*) AS is_trap
         |FROM d GROUP BY host""".stripMargin,

    "c36_adaptive_delay" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |r AS (
         |  SELECT host, canonical_url, seed_rank,
         |    row_number() OVER (PARTITION BY host
         |      ORDER BY seed_rank DESC, canonical_url) AS rk
         |  FROM cfrontier),
         |recent AS (
         |  SELECT host, seed_rank % 900 + 50 AS latency_ms,
         |    CASE rk WHEN 1 THEN 8 WHEN 2 THEN 4 WHEN 3 THEN 2 ELSE 1 END AS w
         |  FROM r WHERE rk <= 4),
         |e AS (
         |  SELECT host,
         |    CAST((sum(w * latency_ms) * 1000) // sum(w) AS BIGINT) AS ewma_fp
         |  FROM recent GROUP BY host)
         |SELECT host, ewma_fp,
         |  CAST(greatest(100, least(5000, (ewma_fp // 1000) * 2)) AS BIGINT) AS delay_ms
         |FROM e""".stripMargin,

    "t10_tfidf" ->
      """WITH w AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM w WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (
        |  SELECT CAST(tf.doc_id AS STRING) AS doc_id, tf.term,
        |    CAST(tf.tf * ((n.n_docs * 1000) // df.df) AS BIGINT) AS score_fp
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT doc_id, term, score_fp,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_fp DESC, term) AS rk
        |  FROM s)
        |SELECT doc_id, term, score_fp, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 3""".stripMargin,

    "s3_sitemap_ingest" ->
      s"""WITH hosts AS (
         |  SELECT concat('h', CAST(id AS STRING), '.example.com') AS host, id
         |  FROM range(0, 50) t(id)),
         |x AS (
         |  SELECT host,
         |    concat('<urlset>',
         |      array_to_string(list_transform(range(0, 20), k ->
         |        concat('<url><loc>https://', host, ':443/s/', CAST(k AS STRING),
         |               '.png</loc><lastmod>2024-',
         |               lpad(CAST((id + k) % 12 + 1 AS STRING), 2, '0'),
         |               '-01</lastmod></url>')), ''),
         |      '</urlset>') AS xml
         |  FROM hosts),
         |entries AS (
         |  SELECT host, unnest(regexp_extract_all(xml, '<url>(.*?)</url>', 1)) AS entry
         |  FROM x),
         |parsed AS (
         |  SELECT host,
         |    regexp_extract(entry, '<loc>([^<]*)</loc>', 1) AS loc,
         |    regexp_extract(entry, '<lastmod>([^<]*)</lastmod>', 1) AS lastmod
         |  FROM entries)
         |SELECT host, ${OracleSql.canonSql("loc")} AS canonical_url, lastmod
         |FROM parsed WHERE lastmod >= '2024-07-01'""".stripMargin,

    // the oracle rebuilds the same robots.txt text and parses it with ITS
    // OWN regex engine + list functions (chr(10) = the \n Spark writes)
    "c37_robots_parse" ->
      """WITH h AS (
        |  SELECT concat('h', CAST(id AS STRING), '.example.com') AS host, id
        |  FROM range(0, 50) t(id)),
        |x AS (
        |  SELECT host,
        |    concat('User-agent: *', chr(10), 'Disallow: /img/', chr(10), 'Allow: /img/1',
        |      CASE WHEN id % 7 = 1 THEN concat(chr(10), 'Disallow:') ELSE '' END,
        |      chr(10), 'Crawl-delay: ', CAST(id % 5 + 1 AS STRING),
        |      CASE WHEN id % 4 <> 0 THEN concat(chr(10), chr(10),
        |        'User-agent: graftbot', chr(10), 'Disallow: /private/', chr(10),
        |        'Allow: /img/', chr(10), 'Crawl-delay: ', CAST(id % 3 + 1 AS STRING))
        |      ELSE '' END) AS txt
        |  FROM h),
        |sec AS (
        |  SELECT host,
        |    regexp_extract(txt, '(?s)User-agent: graftbot\n(.*?)(\n\n|$)', 1) AS gsec,
        |    regexp_extract(txt, '(?s)User-agent: \*\n(.*?)(\n\n|$)', 1) AS ssec
        |  FROM x),
        |pick AS (
        |  SELECT host,
        |    CASE WHEN gsec <> '' THEN 'graftbot' ELSE '*' END AS agent_used,
        |    CASE WHEN gsec <> '' THEN gsec ELSE ssec END AS sec
        |  FROM sec),
        |lines AS (
        |  SELECT host, agent_used,
        |    CAST(regexp_extract(sec, 'Crawl-delay: ([0-9]+)', 1) AS INTEGER) AS crawl_delay,
        |    unnest(list_filter(string_split(sec, chr(10)),
        |      l -> regexp_matches(l, '^(Allow|Disallow): .+'))) AS line
        |  FROM pick)
        |SELECT host, agent_used,
        |  regexp_extract(line, '^(?:Allow|Disallow): (.*)$', 1) AS path_prefix,
        |  starts_with(line, 'Allow:') AS allowed, crawl_delay
        |FROM lines""".stripMargin,

    "g4_host_graph" ->
      """WITH ids AS (SELECT doc_id FROM documents),
        |e0 AS (
        |  SELECT doc_id % 50 AS s, (doc_id * 3 + 1) % 50 AS d FROM ids
        |  UNION ALL
        |  SELECT doc_id % 50, (doc_id + 17) % 50 FROM ids),
        |edges AS (SELECT s, d, count(*) AS n_links FROM e0 WHERE s <> d GROUP BY 1, 2),
        |recip AS (
        |  SELECT e.s FROM edges e
        |  WHERE EXISTS (SELECT 1 FROM edges r WHERE r.s = e.d AND r.d = e.s)),
        |o AS (SELECT s AS hid, count(*) AS out_deg, sum(n_links) AS out_links
        |      FROM edges GROUP BY 1),
        |i AS (SELECT d AS hid, count(*) AS in_deg FROM edges GROUP BY 1),
        |rc AS (SELECT s AS hid, count(*) AS n_recip FROM recip GROUP BY 1),
        |j AS (
        |  SELECT coalesce(o.hid, i.hid, rc.hid) AS hid,
        |    coalesce(out_deg, 0) AS out_deg, coalesce(out_links, 0) AS out_links,
        |    coalesce(in_deg, 0) AS in_deg, coalesce(n_recip, 0) AS n_recip
        |  FROM o FULL JOIN i ON o.hid = i.hid
        |         FULL JOIN rc ON coalesce(o.hid, i.hid) = rc.hid)
        |SELECT concat('h', CAST(hid AS STRING), '.example.com') AS host,
        |  CAST(out_deg AS BIGINT) AS out_deg, CAST(out_links AS BIGINT) AS out_links,
        |  CAST(in_deg AS BIGINT) AS in_deg, CAST(n_recip AS BIGINT) AS n_recip
        |FROM j""".stripMargin,

    // the oracle reconstructs BOTH snapshot states in closed form from the
    // planted arithmetic (base = md5(text); delta: %10 changed, %17
    // tombstoned, %23 appended past max id) and classifies the same way —
    // green proves the time-travel reads + merge-on-read recovered exactly
    // the states the commits encoded
    "k8_snapshot_diff" ->
      """WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |s1 AS (SELECT doc_id, md5(text) AS c1 FROM documents),
        |s2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 10 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS c2
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + n.n, md5(text || 'new') FROM documents, n
        |  WHERE doc_id % 23 = 0),
        |d AS (
        |  SELECT coalesce(s1.doc_id, s2.doc_id) AS doc_id,
        |    CASE WHEN s1.c1 IS NULL THEN 'added'
        |         WHEN s2.c2 IS NULL THEN 'deleted'
        |         WHEN s1.c1 <> s2.c2 THEN 'changed' END AS change,
        |    s2.c2 AS content
        |  FROM s1 FULL JOIN s2 ON s1.doc_id = s2.doc_id)
        |SELECT doc_id, change, content FROM d WHERE change IS NOT NULL""".stripMargin,

    // closed-form planted borders + the m2-style closed-form original dims
    // (crop must equal the pre-pad image exactly) — green proves the
    // detect kernel recovered the pad kernel's widths from the bytes alone
    "m4_letterbox_crop" ->
      """WITH meta AS (
        |  SELECT doc_id AS id,
        |    CASE WHEN doc_id % 50 = 49 AND doc_id >= 25 THEN doc_id - 25
        |         ELSE doc_id END AS src
        |  FROM documents)
        |SELECT id,
        |  CAST(id % 4 + 1 AS BIGINT) AS b_top,
        |  CAST((id + 1) % 4 AS BIGINT) AS b_bottom,
        |  CAST((id + 2) % 4 AS BIGINT) AS b_left,
        |  CAST((id + 3) % 4 AS BIGINT) AS b_right,
        |  CAST(CASE src % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 32
        |       ELSE 64 END AS BIGINT) AS crop_w,
        |  CAST(CASE (src + 1) % 4 WHEN 0 THEN 8 WHEN 1 THEN 16 WHEN 2 THEN 32
        |       ELSE 64 END AS BIGINT) AS crop_h
        |FROM meta""".stripMargin,

    "c38_dot_segments" ->
      s"""WITH ${OracleSql.frontierCte},
         |raw AS (
         |  SELECT seed_rank,
         |    CASE seed_rank % 5
         |      WHEN 0 THEN concat('/img/', CAST(seed_rank AS STRING), '.png')
         |      WHEN 1 THEN concat('/img/./', CAST(seed_rank AS STRING), '.png')
         |      WHEN 2 THEN concat('/img/x/../', CAST(seed_rank AS STRING), '.png')
         |      WHEN 3 THEN concat('/a/b/c/../../', CAST(seed_rank AS STRING), '.png')
         |      ELSE concat('/./a/../img/', CAST(seed_rank AS STRING), '.png')
         |    END AS raw_path
         |  FROM frontier)
         |SELECT seed_rank, raw_path,
         |  ${OracleSql.dotSegSql("raw_path")} AS norm_path
         |FROM raw""".stripMargin,

    // the compacted single-snapshot read must equal the closed-form MOR
    // state the two-commit chain encoded (k8's s2 CTE verbatim)
    "k10_snapshot_compact" ->
      """WITH n AS (SELECT max(doc_id) + 1 AS n FROM documents)
        |SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0 THEN md5(text || 'v2') ELSE md5(text) END AS content
        |FROM documents WHERE doc_id % 17 <> 0
        |UNION ALL
        |SELECT doc_id + n.n, md5(text || 'new') FROM documents, n
        |WHERE doc_id % 23 = 0""".stripMargin,

    // the observe()-captured per-commit row counts must equal the planted
    // commit sizes: base = |documents|, delta = changed + tombstoned + added
    "k9_lineage_metrics" ->
      """WITH c AS (SELECT count(*) AS base FROM documents),
        |d AS (
        |  SELECT
        |    (SELECT count(*) FROM documents WHERE doc_id % 10 = 0 AND doc_id % 17 <> 0)
        |    + (SELECT count(*) FROM documents WHERE doc_id % 17 = 0)
        |    + (SELECT count(*) FROM documents WHERE doc_id % 23 = 0) AS delta)
        |SELECT CAST(0 AS BIGINT) AS snapshot_id, CAST(1 AS BIGINT) AS batch_id,
        |  CAST(base AS BIGINT) AS rows_added, CAST(base AS BIGINT) AS rows_total
        |FROM c
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |  CAST(delta AS BIGINT), CAST(base + delta AS BIGINT)
        |FROM c, d""".stripMargin
  )
}
