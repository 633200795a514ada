package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.canon.UrlCanon
import graft.queries.{CrawlOpsQueries, DataOpsQueries, Fixture, OracleSql, RefOpsQueries}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-runnable oracle twin where the
  * semantics are ANSI-SQL-expressible.
  *
  * Numeric-parity rules (driver hash-compares values):
  *  - double sums go through DECIMAL(18,6) so aggregation order cannot
  *    perturb low bits, then cast back to double;
  *  - integer arithmetic only in derived keys (no float division);
  *  - every aggregate/computed column is aliased identically here and in
  *    the SQL.
  */
object SparkEntry {

  /** Flagship: the politeness-scheduled crawl batch (canonicalize →
    * seen-gate → per-host window rank) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("c5_politeness_rank")(spark, "/root/testdata/sf0.001")

  private def decSum(c: String, as: String) =
    sum(col(c).cast(DecimalType(18, 6))).cast("double").as(as)

  /** (canonical_url, host, n_refs): the next-frontier candidate set
    * extracted from fetched page bodies — shared by c26 (the step in
    * isolation) and e4 (the composed crawl loop). */
  private def outlinkFrontier(s: SparkSession, dir: String): DataFrame = {
    val body = concat(col("text"),
      lit(" <a href=\"https://H"), (col("doc_id") % 50).cast("string"),
      lit(".EXAMPLE.com/p/"), col("doc_id").cast("string"), lit(".png\">x</a>"),
      lit(" <a href=\"https://h"), ((col("doc_id") * 3) % 50).cast("string"),
      lit(".example.com:443/hub/"), (col("doc_id") % 40).cast("string"),
      lit(".png#f\">y</a>"))
    Fixture.documents(s, dir)
      .select(col("doc_id"), body.as("body"))
      .select(col("doc_id"),
        explode(expr("""regexp_extract_all(body, 'href="([^"]+)"', 1)""")).as("link"))
      .select(UrlCanon.canonicalUrl(col("link")).as("canonical_url"),
        UrlCanon.hostOf(col("link")).as("host"))
      .groupBy(col("canonical_url"), col("host"))
      .agg(count(lit(1)).as("n_refs"))
  }

  /** DuckDB twin of [[outlinkFrontier]], as a `ofrontier` CTE body. */
  private def outlinkFrontierCte: String =
    s"""bodies AS (
       |  SELECT doc_id, text ||
       |    ' <a href="https://H' || CAST(doc_id % 50 AS VARCHAR) ||
       |    '.EXAMPLE.com/p/' || CAST(doc_id AS VARCHAR) || '.png">x</a>' ||
       |    ' <a href="https://h' || CAST((doc_id * 3) % 50 AS VARCHAR) ||
       |    '.example.com:443/hub/' || CAST(doc_id % 40 AS VARCHAR) || '.png#f">y</a>' AS body
       |  FROM documents),
       |links AS (
       |  SELECT unnest(regexp_extract_all(body, 'href="([^"]+)"', 1)) AS link
       |  FROM bodies),
       |ofrontier AS (
       |  SELECT ${OracleSql.canonSql("link")} AS canonical_url,
       |    ${OracleSql.hostSql("link")} AS host, count(*) AS n_refs
       |  FROM links GROUP BY 1, 2)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = base ++
    RefOpsQueries.queries ++ DataOpsQueries.queries ++ CrawlOpsQueries.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------
    // A3/A1 hash aggregation (reference: s2processor.py:113-118 merge as
    // hash-agg; SURVEY.md §2.4). TPC-H Q1 shape — partial agg map-side.
    "q1_agg" -> ((s, dir) => {
      Fixture.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          decSum("l_quantity", "sum_qty"),
          decSum("l_extendedprice", "sum_base_price"),
          count(lit(1)).as("count_order"))
    }),

    // F9/F10 + canonicalization (UrlCanon; reference dblpclient.py:308-317,
    // 391-395): project canonical_url + host from the messy frontier.
    "c1_canonicalize" -> ((s, dir) => {
      Fixture.frontier(s, dir).select(
        col("seed_rank"),
        col("url"),
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
        UrlCanon.hostOf(col("url")).as("host"))
    }),

    // A2-style distinct aggregation per host (host-key frequency — the
    // skew profile the salted partitioner must absorb).
    "c2_host_agg" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir)
      f.select(UrlCanon.hostOf(col("url")).as("host"),
          UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("canonical_url")).as("n_distinct"))
    }),

    // J4/J2 frontier-minus-seen anti join (the crawl-dedup step;
    // reference: md5 skip-download check, dblpclient.py:437-443).
    "c3_seen_antijoin" -> ((s, dir) => {
      val cand = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
        .distinct()
      cand.join(Fixture.seenSet(s, dir), Seq("canonical_url"), "left_anti")
    }),

    // J2 semi join (reference F5 corpusid gate, s2processor.py:173-174).
    "c4_seen_semijoin" -> ((s, dir) => {
      val cand = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
        .distinct()
      cand.join(Fixture.seenSet(s, dir), Seq("canonical_url"), "left_semi")
    }),

    // Politeness scheduler core: per-host budget as window rank
    // (SURVEY.md §2.4 note; north_rule "priority-queue scheduler
    // expressed as window-ranked micro-batches"). Budget = 2. Uses the
    // BANDED rank — the skew-split plan the engine auto-selects at ≥1M
    // urls (CrawlPipeline.Config.bandedAutoThreshold) — which is
    // bit-identical to the single-window form (asserted in CrawlOrderSpec)
    // but spreads a Zipf-hot host over #priority-bands tasks, so the
    // driver-benched query is the plan that runs at 100 TB.
    "c5_politeness_rank" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir).select(
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
        UrlCanon.hostOf(col("url")).as("host"),
        col("priority"), col("seed_rank"))
      graft.sched.Scheduler.scheduleBanded(f, None, defaultBudget = 2)
        .filter(col("rk") <= 2)
        .select(col("host"), col("canonical_url"), col("priority"), col("seed_rank"), col("rk"))
    }),

    // Exact dedup by content fingerprint (training-data op; md5 as the
    // exact-hash groupBy — reference analog A4 md5, dblpclient.py:53-69).
    "d1_dedup_exact" -> ((s, dir) => {
      graft.ops.Dedup.exact(Fixture.documents(s, dir), "text", "doc_id")
    }),

    // Cuckoo-filter seen gate (north_rule's second filter shape), exact
    // composition: cuckoo-negatives pass, positives exact-confirmed — must
    // be row-equal to the plain exact anti join, so it shares c3's oracle.
    // The shard build is MEMOIZED per (sf dir, buckets) — the filter is
    // corpus state, maintained not rebuilt at scale (ShardStore), so the
    // benched query is the steady-state probe, not a cold per-call build
    // (same reasoning as Ivf.trainCached for d8's centroids).
    "c22_cuckoo_gate" -> ((s, dir) => {
      val cand = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
        .distinct()
      // register = no-op: this query's candidates plan is identical every
      // invocation, so CacheManager dedupes to one entry (see the gate's
      // scaladoc); the oracle fixture corpus is immutable per sf dir
      graft.seen.CuckooSeen.notSeenExactWithCuckooCached(
        corpusTag = s"sfdir:$dir", cand, Fixture.seenSet(s, dir), numBuckets = 16,
        register = _ => ())
    }),

    // robots.txt gate (north_rule "robots gating"): longest-prefix-wins
    // precedence with allow-first ties, one rules-array row per host
    // broadcast against the frontier. The rules dimension is shaped so
    // every precedence branch fires (Fixture.robotsDim).
    "c25_robots_gate" -> ((s, dir) => {
      val f = Fixture.frontier(s, dir).select(
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
        UrlCanon.hostOf(col("url")).as("host"),
        col("priority"), col("seed_rank"))
      graft.sched.Scheduler.robotsFilter(f, Fixture.robotsDim(s))
        .select("canonical_url", "host", "priority", "seed_rank")
    }),

    // Batch twin of the STATEFUL host limiter (streaming/Streaming.scala:
    // statefulHostLimiter — the flatMapGroupsWithState politeness budget
    // that survives across micro-batches). Batch execution runs the same
    // bounded-heap group kernel with empty state, so its admission
    // semantics (k lexicographically-smallest granted, rest deferred with
    // host_total pinned at the budget) are DuckDB-expressible as a window
    // rank — the one engine capability that previously had specs but no
    // driver-surface row. Cross-batch state carry is StreamingSpec's job.
    "l1_host_limiter" -> ((s, dir) => {
      import s.implicits._
      // distinct on the canonical url alone (host is functionally
      // determined by it — the c28/c33 narrowing), host derived from the
      // distinct rows after the exchange
      val cand = Fixture.frontier(s, dir)
        .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
        .distinct()
        .select(UrlCanon.hostOf(col("canonical_url")).as("host"),
          col("canonical_url"))
        .as[(String, String)]
      graft.streaming.Streaming.statefulHostLimiter(cand, budgetPerBatch = 3).toDF()
    }),

    // Outlink extraction → next-frontier derivation: the crawl-loop step
    // that turns fetched page bodies into new frontier candidates. Bodies
    // are the documents with two deterministic embedded anchors (messy on
    // purpose: uppercase host, :443 port, #fragment); extraction is the
    // codegen'd regexp_extract_all builtin, then canonicalize → dedup →
    // reference-count (the popularity prior a frontier scorer consumes).
    "c26_outlink_frontier" -> ((s, dir) => outlinkFrontier(s, dir)),

    // The composed crawl loop — what one full iteration of the crawler
    // actually runs, as ONE lazy plan (no driver round-trip between
    // stages): outlink frontier (c26's extract→canon→refcount) → seen
    // gate (anti join against the already-fetched page set — 1/3 of the
    // /p/ pages, planted arithmetically) → politeness-capped fetch list,
    // top-5 urls per host prioritized by reference count through the
    // bounded weighted top-k aggregator (no per-host window sort — a hot
    // host at 10^10 urls is k reduce-side rows).
    "e4_crawl_loop" -> ((s, dir) => {
      val seen = Fixture.documents(s, dir).filter(col("doc_id") % 3 === 0)
        .select(UrlCanon.canonicalUrl(concat(
          lit("https://H"), (col("doc_id") % 50).cast("string"),
          lit(".EXAMPLE.com/p/"), col("doc_id").cast("string"), lit(".png")))
          .as("canonical_url"))
      val fresh = outlinkFrontier(s, dir)
        .join(seen, Seq("canonical_url"), "left_anti")
      graft.ops.Sampling.topKWeighted(fresh, "host", "canonical_url", "n_refs", k = 5)
    }),

    // Freshness-driven recrawl scheduling — the operator that decides
    // WHICH already-crawled pages a crawl batch revisits: per-url fetch
    // history (age since last fetch, change rate over past fetches,
    // derived arithmetically from the frontier so the oracle shares it)
    // scores priority = change_rate × age in pure integer arithmetic
    // (change_rate_fp = changes·1000 DIV fetches — cross-engine exact),
    // then the bounded weighted top-k aggregator picks each host's top-3
    // revisits: O(k) state per host, map-side partials, no per-host
    // window sort (the same Zipf-hot-host posture as e4/a1).
    "c28_recrawl_priority" -> ((s, dir) => {
      // grouped on the canonical url alone — host is functionally
      // determined by it (hostOf(canonical) ≡ hostOf(raw): lowercasing
      // and default-port stripping already applied), so the aggregation
      // exchange carries one string per row and the host kernel runs
      // once per distinct url, post-shuffle (guide §2.3)
      val f = Fixture.frontier(s, dir).select(
        UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
        col("seed_rank"))
      val hist = f.groupBy(col("canonical_url"))
        .agg(min(col("seed_rank")).as("sr"))
        .select(col("canonical_url"),
          UrlCanon.hostOf(col("canonical_url")).as("host"),
          (col("sr") % 720).as("age_hours"),
          (lit(1) + col("sr") % 13).as("n_fetches"),
          least(col("sr") % 7, lit(1) + col("sr") % 13).as("n_changes"))
      val scored = hist.select(col("host"), col("canonical_url"),
        (expr("(n_changes * 1000) DIV n_fetches") * (lit(1) + col("age_hours")))
          .as("priority_fp"))
      graft.ops.Sampling.topKWeighted(scored, "host", "canonical_url", "priority_fp", k = 3)
    }),

    // Visible-text extraction from fetched HTML — the step between raw
    // page bytes and every downstream text operator. Bodies wrap each
    // document in deterministic HTML exercising all strip classes:
    // script (with a bare '<' in code), style, comments, entity-encoded
    // text in both title and body. The whole chain is codegen'd regex
    // builtins in the Java∩RE2 dialect; the oracle runs it verbatim.
    "c27_html_text" -> ((s, dir) => {
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit(" &amp; friends</title>"),
        lit("<script type=\"text/javascript\">var x = 1 < 2; if (x) { go(); }</script>"),
        lit("<style>.c{color:#fff}</style></head><body><h1>Section "),
        (col("doc_id") % 7).cast("string"), lit("</h1>"),
        lit("<!-- crawl-id "), col("doc_id").cast("string"), lit(" --><p>"),
        col("text"),
        lit("</p><p>tail &lt;b&gt; &quot;quoted&#39;s&quot;</p></body></html>"))
      Fixture.documents(s, dir)
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"),
          graft.extract.HtmlText.title(col("html")).as("title"),
          md5(graft.extract.HtmlText.visibleText(col("html")).cast("binary")).as("text_md5"),
          length(graft.extract.HtmlText.visibleText(col("html"))).as("n_chars"))
    }),

    // K2 JSONL.gz export sink (reference s2processor.py:209-236): write →
    // re-read → project. The oracle sees the ORIGINAL table, so a green row
    // proves the round trip is byte-faithful (text goes through an md5 so
    // the whole payload is compared, not a prefix).
    "c23_export_jsonl" -> ((s, dir) => {
      val docs = Fixture.documents(s, dir).select(col("doc_id"), col("text"), col("source"))
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-export-jsonl-${math.abs(dir.hashCode)}"
      graft.sources.Export.toJsonlGz(docs, out)
      s.read.schema("doc_id LONG, text STRING, source STRING").json(out)
        .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"), col("source"))
    }),

    // K3 flattened tab/gzip/CRLF CSV export sink (s2processor.py:240-257):
    // struct columns json_normalize-flattened into dotted headers, written
    // tab-separated gzip CRLF, re-read, dotted columns renamed for the
    // oracle compare.
    "c24_export_csv" -> ((s, dir) => {
      val docs = Fixture.documents(s, dir).select(
        col("doc_id"),
        struct(col("source").as("source"), col("n_chars").as("n_chars")).as("meta"))
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-export-csv-${math.abs(dir.hashCode)}"
      graft.sources.Export.toCsvGz(docs, out)
      s.read.option("sep", "\t").option("header", "true").option("lineSep", "\r\n")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("meta.source", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("meta.n_chars", org.apache.spark.sql.types.LongType))))
        .csv(out)
        .select(col("doc_id"), col("`meta.source`").as("meta_source"),
          col("`meta.n_chars`").as("meta_n_chars"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "c1_canonicalize" ->
      s"""WITH ${OracleSql.frontierCte}
         |SELECT seed_rank, url,
         |  ${OracleSql.canonSql("url")} AS canonical_url,
         |  ${OracleSql.hostSql("url")} AS host
         |FROM frontier""".stripMargin,

    "c2_host_agg" ->
      s"""WITH ${OracleSql.canonFrontierCte}
         |SELECT host, count(*) AS n_urls,
         |  count(DISTINCT canonical_url) AS n_distinct
         |FROM cfrontier GROUP BY host""".stripMargin,

    "c3_seen_antijoin" ->
      s"""WITH ${OracleSql.canonFrontierCte}
         |SELECT DISTINCT canonical_url FROM cfrontier c
         |WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.canonical_url = c.canonical_url)""".stripMargin,

    "c4_seen_semijoin" ->
      s"""WITH ${OracleSql.canonFrontierCte}
         |SELECT DISTINCT canonical_url FROM cfrontier c
         |WHERE EXISTS (SELECT 1 FROM seen s WHERE s.canonical_url = c.canonical_url)""".stripMargin,

    "c5_politeness_rank" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |ranked AS (
         |  SELECT host, canonical_url, priority, seed_rank,
         |    row_number() OVER (PARTITION BY host ORDER BY priority, seed_rank, canonical_url) AS rk
         |  FROM cfrontier)
         |SELECT host, canonical_url, priority, seed_rank, rk FROM ranked WHERE rk <= 2""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT md5(text) AS fingerprint, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin,

    "c22_cuckoo_gate" ->
      s"""WITH ${OracleSql.canonFrontierCte}
         |SELECT DISTINCT canonical_url FROM cfrontier c
         |WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.canonical_url = c.canonical_url)""".stripMargin,

    // generic longest-prefix robots twin: best matching rule per url by
    // (len, prefix, allowed) descending — the same lexicographic order
    // Scheduler.robotsFilter's array_max(struct) uses — kept iff no rule
    // matches or the winning rule allows
    "c25_robots_gate" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |robots AS (
         |  SELECT concat('h', CAST(id AS STRING), '.example.com') AS host,
         |         '/img/' AS path_prefix, FALSE AS allowed
         |  FROM range(0, 50) t(id) WHERE id % 10 = 3 OR id % 10 = 7
         |  UNION ALL
         |  SELECT concat('h', CAST(id AS STRING), '.example.com'), '/img/1', TRUE
         |  FROM range(0, 50) t(id) WHERE id % 10 = 3
         |  UNION ALL
         |  SELECT concat('h', CAST(id AS STRING), '.example.com'), '/img/2', TRUE
         |  FROM range(0, 50) t(id) WHERE id % 10 = 7
         |  UNION ALL
         |  SELECT concat('h', CAST(id AS STRING), '.example.com'), '/img/2', FALSE
         |  FROM range(0, 50) t(id) WHERE id % 10 = 7),
         |matched AS (
         |  SELECT c.canonical_url, r.allowed,
         |    row_number() OVER (PARTITION BY c.canonical_url
         |      ORDER BY length(r.path_prefix) DESC, r.path_prefix DESC, r.allowed DESC) AS rn
         |  FROM cfrontier c JOIN robots r ON c.host = r.host
         |    AND starts_with(regexp_replace(c.canonical_url, '^[a-z][a-z0-9+.-]*://[^/]*', ''), r.path_prefix))
         |SELECT c.canonical_url, c.host, c.priority, c.seed_rank
         |FROM cfrontier c
         |LEFT JOIN (SELECT canonical_url, allowed FROM matched WHERE rn = 1) v
         |  ON c.canonical_url = v.canonical_url
         |WHERE v.allowed IS NULL OR v.allowed""".stripMargin,

    // window-rank twin of the bounded-heap admission kernel: grants = the
    // budget smallest urls per host (rank as running total), deferrals
    // carry base+budget when the group exceeded the budget (deferrals
    // exist only then, and base = 0 in a fresh batch)
    "l1_host_limiter" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |cand AS (SELECT DISTINCT host, canonical_url FROM cfrontier),
         |r AS (
         |  SELECT host, canonical_url,
         |    row_number() OVER (PARTITION BY host ORDER BY canonical_url) AS rk
         |  FROM cand)
         |SELECT host, canonical_url, rk <= 3 AS granted,
         |  CAST(CASE WHEN rk <= 3 THEN rk ELSE 3 END AS BIGINT) AS host_total_granted
         |FROM r""".stripMargin,

    // the oracle rebuilds the same page bodies, extracts with ITS OWN
    // regexp_extract_all, and canonicalizes with the shared canon twin
    "c26_outlink_frontier" ->
      s"""WITH $outlinkFrontierCte
         |SELECT canonical_url, host, n_refs FROM ofrontier""".stripMargin,

    // composed crawl loop: c26's frontier CTE → already-fetched anti join
    // (the 1/3 planted /p/ page set) → per-host top-5 window rank, the
    // oracle twin of the bounded weighted top-k aggregator
    "e4_crawl_loop" ->
      s"""WITH $outlinkFrontierCte,
         |seen AS (
         |  SELECT ${OracleSql.canonSql(
             "('https://H' || CAST(doc_id % 50 AS VARCHAR) || '.EXAMPLE.com/p/' || CAST(doc_id AS VARCHAR) || '.png')")} AS canonical_url
         |  FROM documents WHERE doc_id % 3 = 0),
         |fresh AS (
         |  SELECT * FROM ofrontier o
         |  WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.canonical_url = o.canonical_url)),
         |r AS (
         |  SELECT host, canonical_url, CAST(n_refs AS BIGINT) AS n_refs,
         |    row_number() OVER (PARTITION BY host ORDER BY n_refs DESC, canonical_url) AS rk
         |  FROM fresh)
         |SELECT host, canonical_url, n_refs, rk FROM r WHERE rk <= 5""".stripMargin,

    // same arithmetic history, same integer scoring (`//` = DIV), window
    // rank as the bounded-aggregator twin
    "c28_recrawl_priority" ->
      s"""WITH ${OracleSql.canonFrontierCte},
         |hist AS (
         |  SELECT canonical_url, host, min(seed_rank) AS sr
         |  FROM cfrontier GROUP BY 1, 2),
         |h2 AS (
         |  SELECT canonical_url, host, sr % 720 AS age_hours,
         |    1 + sr % 13 AS n_fetches,
         |    least(sr % 7, 1 + sr % 13) AS n_changes
         |  FROM hist),
         |scored AS (
         |  SELECT host, canonical_url,
         |    CAST(((n_changes * 1000) // n_fetches) * (1 + age_hours) AS BIGINT) AS priority_fp
         |  FROM h2),
         |r AS (
         |  SELECT host, canonical_url, priority_fp,
         |    row_number() OVER (PARTITION BY host ORDER BY priority_fp DESC, canonical_url) AS rk
         |  FROM scored)
         |SELECT host, canonical_url, priority_fp, rk FROM r WHERE rk <= 3""".stripMargin,

    // the verbatim same strip chain (inline (?is)/(?s) flags are RE2 ∩
    // Java; DuckDB needs the explicit 'g' that Spark applies implicitly);
    // length() CAST to INTEGER to match Spark's int-typed length
    "c27_html_text" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || ' &amp; friends</title>' ||
        |    '<script type="text/javascript">var x = 1 < 2; if (x) { go(); }</script>' ||
        |    '<style>.c{color:#fff}</style></head><body><h1>Section ' || CAST(doc_id % 7 AS VARCHAR) || '</h1>' ||
        |    '<!-- crawl-id ' || CAST(doc_id AS VARCHAR) || ' --><p>' || text ||
        |    '</p><p>tail &lt;b&gt; &quot;quoted&#39;s&quot;</p></body></html>' AS html
        |  FROM documents),
        |v AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |          '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<!--.*?-->', ' ', 'g'),
        |          '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS vt,
        |    trim(replace(replace(replace(replace(replace(
        |      regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', chr(39)), '&amp;', '&')) AS title
        |  FROM h)
        |SELECT doc_id, title, md5(vt) AS text_md5,
        |  CAST(length(vt) AS INTEGER) AS n_chars
        |FROM v""".stripMargin,

    // the oracle reads the ORIGINAL documents table — equality proves the
    // export → re-read round trip lost nothing
    "c23_export_jsonl" ->
      """SELECT doc_id, md5(text) AS text_md5, source FROM documents""",

    "c24_export_csv" ->
      """SELECT doc_id, source AS meta_source, n_chars AS meta_n_chars FROM documents"""
  ) ++ RefOpsQueries.oracle ++ DataOpsQueries.oracle ++ CrawlOpsQueries.oracle
}
