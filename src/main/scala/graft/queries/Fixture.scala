package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic derivation of crawl-shaped tables from the driver's
  * TPC-H-ish parquet (TESTDATA.md) so that every crawl operator has a
  * DuckDB-checkable oracle: the SAME arithmetic runs in Spark (here, via
  * the DataFrame API) and in DuckDB (via [[OracleSql]] CTE text).
  *
  * The derived `frontier` is intentionally messy — mixed-case hosts,
  * explicit :443 ports, fragments — to exercise canonicalization, and its
  * hosts are `l_partkey % 50` so host frequencies are uniform-ish while
  * `l_orderkey % k` predicates give deterministic subsets.
  */
object Fixture {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def events(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/events.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** frontier(url, seed_rank, priority) — see OracleSql.frontierCte for the
    * twin SQL. seed_rank is pure arithmetic (no global window) so the
    * derivation itself is shuffle-free and scales. */
  def frontier(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val host = concat(
      when(col("l_orderkey") % 3 === 0, concat(lit("H"), (col("l_partkey") % 50).cast("string"), lit(".EXAMPLE.com")))
        .otherwise(concat(lit("h"), (col("l_partkey") % 50).cast("string"), lit(".example.com"))),
      when(col("l_orderkey") % 5 === 0, lit(":443")).otherwise(lit("")))
    val url = concat(
      lit("https://"), host,
      lit("/img/"), col("l_orderkey").cast("string"), lit("_"), col("l_linenumber").cast("string"), lit(".png"),
      when(col("l_orderkey") % 7 === 0, lit("#f")).otherwise(lit("")))
    li.select(
      url.as("url"),
      (col("l_orderkey") * 8 + col("l_linenumber")).as("seed_rank"),
      (col("l_partkey") % 100).as("priority"))
  }

  /** Deterministic robots dimension over the frontier's 50 hosts,
    * shaped to exercise every precedence branch of
    * [[graft.sched.Scheduler.robotsFilter]] (longest prefix wins;
    * exact-(len,prefix) ties resolve allow-first):
    *   - h3,h13,…  disallow `/img/` but allow `/img/1` (longer wins);
    *   - h7,h17,…  disallow `/img/` AND carry an equal-length allow +
    *     disallow pair on `/img/2` (tie → allow);
    *   - all other hosts: no rules (must pass untouched).
    * Twin SQL: the `robots` CTE in the c25 oracle. */
  def robotsDim(spark: SparkSession): DataFrame = {
    val h = spark.range(0, 50)
    val host = concat(lit("h"), col("id").cast("string"), lit(".example.com"))
    def rule(cond: Column, prefix: String, allowed: Boolean) =
      h.filter(cond).select(host.as("host"), lit(prefix).as("path_prefix"), lit(allowed).as("allowed"))
    rule(col("id") % 10 === 3 || col("id") % 10 === 7, "/img/", allowed = false)
      .union(rule(col("id") % 10 === 3, "/img/1", allowed = true))
      .union(rule(col("id") % 10 === 7, "/img/2", allowed = true))
      .union(rule(col("id") % 10 === 7, "/img/2", allowed = false))
  }

  /** Deterministic "already seen" membership set: canonical urls of the
    * even-orderkey half of the frontier. Since seed_rank = orderkey*8 +
    * linenumber with linenumber in 1..7, `seed_rank % 16 < 8` ⇔ even
    * orderkey — integer-only arithmetic, identical in Spark and DuckDB
    * (float division rounds differently between the two engines).
    *
    * PERSISTED once per (session, dir): the seen set is CAMPAIGN STATE —
    * in production it is a materialized table every gate reads, not a
    * derivation re-run per query. c3/c4/c22 each consume it (some twice,
    * via the exact-confirm branch), and its distinct() is a full shuffle;
    * deriving it per consumer would bench the fixture, not the gate.
    * (Through round 3 this caching happened by ACCIDENT — c22's fast path
    * persisted its seen input and ran first alphabetically; making it
    * explicit keeps the benched shape when c22's build is memoized.)
    *
    * Only the PERSIST CALL is deduplicated (a string key per session —
    * Spark's CacheManager matches cached data by PLAN, so a freshly
    * derived DataFrame reuses the cached rows without us retaining any
    * DataFrame reference; retaining one would pin the whole stopped
    * session's object graph, which is why this is not a session→DF map). */
  private val seenPersisted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def seenSet(spark: SparkSession, dir: String): DataFrame = {
    val df = seenSetUncached(spark, dir)
    val key = org.apache.spark.sql.graftbridge.Bridge.sessionUUID(spark) + "#" + dir
    if (seenPersisted.add(key))
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df
  }

  def seenSetUncached(spark: SparkSession, dir: String): DataFrame = {
    import graft.canon.UrlCanon
    frontier(spark, dir)
      .filter(col("seed_rank") % 16 < 8)
      .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
      .distinct()
  }

  /** redirects(src, dst) — planted redirect graph over the dense doc_id
    * domain (0..n−1): within each 8-block, i → i−1 (chains of 1..7 hops
    * descending to the block head, which has no out-edge), and every 10th
    * block closes into an 8-cycle via head → head+7 — added only when the
    * block is complete (head+7 ≤ max id), so a truncated tail block
    * degrades to a plain chain. Ground truth is therefore closed-form
    * (the g1 oracle): non-cycle sources resolve to i − i%8 in i%8 hops;
    * members of closed blocks are unresolved. */
  def redirects(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"))
    val withMx = d.crossJoin(broadcast(d.agg(max("doc_id").as("__mx"))))
    withMx.filter(col("doc_id") % 8 =!= 0)
      .select(col("doc_id").as("src"), (col("doc_id") - 1).as("dst"))
      .unionByName(withMx
        .filter(col("doc_id") % 80 === 0 && col("doc_id") + 7 <= col("__mx"))
        .select(col("doc_id").as("src"), (col("doc_id") + 7).as("dst")))
  }

  /** docLines(doc_id, line_no, line) — the documents table re-shaped as a
    * multi-line page corpus for cross-corpus line dedup (d14): three
    * 3-token content chunks from the doc's own text (word-soup, so chunk
    * collisions across docs are organic near-boilerplate), a per-doc
    * footer shared by every doc with the same `doc_id % 7` (planted
    * boilerplate, 7 distinct lines corpus-wide) and, on every third doc, a
    * corpus-wide cookie banner — the exact nuisance lines the C4 pipeline
    * strips. Pure arithmetic + fixed-index token slices: shuffle-free in
    * Spark and reproduced verbatim by the d14 oracle's `lines` CTE. */
  def docLines(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    def chunk(no: Int, from: Int) = d.select(
      col("doc_id"), lit(no.toLong).as("line_no"),
      array_join(slice(split(col("text"), " "), from, 3), " ").as("line"))
    chunk(0, 1)
      .unionByName(chunk(1, 4))
      .unionByName(chunk(2, 7))
      .unionByName(d.select(col("doc_id"), lit(3L).as("line_no"),
        concat(lit("footer boilerplate "), (col("doc_id") % 7).cast("string")).as("line")))
      .unionByName(d.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), lit(4L).as("line_no"),
          lit("accept cookies to continue").as("line")))
  }

  /** linkEdges(src, dst) — deterministic link graph over the dense doc_id
    * domain: each page links to (i+1)%n, (2i+1)%n and (7i+13)%n (n =
    * max id + 1), self-loops dropped, deduped — out-degree 2..3, every id
    * reachable. Twin SQL: the g2 oracle's `edges` CTE. */
  def linkEdges(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir).select(col("doc_id"))
    val withN = d.crossJoin(broadcast(d.agg((max("doc_id") + 1).as("__n"))))
    Seq("doc_id + 1", "doc_id * 2 + 1", "doc_id * 7 + 13")
      .map(f => withN.selectExpr("doc_id AS src", s"($f) % __n AS dst"))
      .reduce(_ unionByName _)
      .filter(col("src") =!= col("dst"))
      .distinct()
  }
}
