package graft.queries

/** DuckDB-runnable SQL twins of the Spark fixtures in [[Fixture]].
  * Any change here must be mirrored there — the driver hash-compares the
  * two result sets (columns sorted by name).
  */
object OracleSql {

  /** SQL twin of Fixture.frontier. Portable Spark/DuckDB dialect subset:
    * concat, CASE, CAST(AS STRING), %, *, +. */
  val frontierCte: String =
    """frontier AS (
      |  SELECT
      |    concat('https://',
      |      CASE WHEN l_orderkey % 3 = 0
      |           THEN concat('H', CAST(l_partkey % 50 AS STRING), '.EXAMPLE.com')
      |           ELSE concat('h', CAST(l_partkey % 50 AS STRING), '.example.com') END,
      |      CASE WHEN l_orderkey % 5 = 0 THEN ':443' ELSE '' END,
      |      '/img/', CAST(l_orderkey AS STRING), '_', CAST(l_linenumber AS STRING), '.png',
      |      CASE WHEN l_orderkey % 7 = 0 THEN '#f' ELSE '' END) AS url,
      |    l_orderkey * 8 + l_linenumber AS seed_rank,
      |    l_partkey % 100 AS priority
      |  FROM lineitem
      |)""".stripMargin

  /** SQL expression: canonical form of url expression `u` — must match
    * graft.canon.UrlCanon.canonicalUrl exactly. */
  def canonSql(u: String): String = {
    val nofrag = s"regexp_replace($u, '#.*$$', '')"
    // prefix = scheme://host[:port]
    val pre = s"regexp_extract($nofrag, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*', 0)"
    val rest = s"substring($nofrag, length($pre) + 1)"
    val noPort = s"regexp_replace(regexp_replace(lower($pre), ':80$$', ''), ':443$$', '')"
    s"concat($noPort, $rest)"
  }

  /** SQL expression: lowercase host of url expression `u` — must match
    * UrlCanon.hostOf. */
  def hostSql(u: String): String =
    s"lower(regexp_extract($u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:#?]*)', 1))"

  /** SQL twin of UrlCanon.removeDotSegments: the SAME 8 unrolled passes of
    * the two global rewrites (DuckDB needs the explicit 'g' flag Spark
    * applies implicitly; both engines scan leftmost and continue after
    * each replacement, so pass-for-pass results are identical). */
  def dotSegSql(p: String): String =
    (1 to 8).foldLeft(p)((q, _) =>
      s"regexp_replace(regexp_replace($q, '/\\./', '/', 'g'), '/[^/]+/\\.\\./', '/', 'g')")

  /** canonical frontier + seen CTEs (seen = even-orderkey half). */
  val canonFrontierCte: String =
    s"""$frontierCte,
       |cfrontier AS (
       |  SELECT url, seed_rank, priority,
       |         ${canonSql("url")} AS canonical_url,
       |         ${hostSql("url")} AS host
       |  FROM frontier
       |),
       |seen AS (
       |  SELECT DISTINCT canonical_url FROM cfrontier
       |  WHERE seed_rank % 16 < 8
       |)""".stripMargin
}
