package graft.canon

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + salted-hash partitioning, as pure `Column`
  * functions (codegen'd by Catalyst — no UDFs; SURVEY.md §2.6).
  *
  * Canonicalization semantics (documented contract, shared with the DuckDB
  * oracle SQL in [[graft.SparkEntry.oracleSql]]):
  *   1. strip the fragment (`#...`)
  *   2. lowercase the scheme://host[:port] prefix (path/query untouched)
  *   3. strip default ports `:80` and `:443`
  * Reference analog: the reference dedupes release files by exact URL
  * string (csinsights/client/dblpclient.py:437-443); canonicalization is
  * the web-scale generalization.
  */
object UrlCanon {

  /** url minus `#fragment`. */
  def stripFragment(url: Column): Column = regexp_replace(url, "#.*$", "")

  /** `scheme://host[:port]` prefix of a fragment-free url ("" if absent). */
  private def prefixOf(u: Column): Column = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", 0)

  def canonicalUrl(url: Column): Column = {
    val u = stripFragment(url)
    val pre = prefixOf(u)
    val rest = substring_index_rest(u, pre)
    val lowered = lower(pre)
    val noPort = regexp_replace(regexp_replace(lowered, ":80$", ""), ":443$", "")
    concat(noPort, rest)
  }

  /** everything after the prefix (expr-level substring from prefix length). */
  private def substring_index_rest(u: Column, pre: Column): Column =
    substring(u, length(pre) + 1, lit(Int.MaxValue))

  /** lowercase host (no port) of a url. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:#?]*)", 1))

  /** filename component (reference analog F9: `url.rpartition("/")[-1]`,
    * csinsights/client/dblpclient.py:308-317). */
  def filenameOf(url: Column): Column = substring_index(url, "/", -1)

  /** Salted 64-bit partition key over the canonical url. The salt decouples
    * the partitioning hash from any hash used in filters, so a hot HOST
    * does not imply a hot PARTITION (north_rule: "salted-hash partitioned
    * to kill host-key skew"). Spark's xxhash64 is a stable published hash.
    */
  def saltedKey(canonicalUrl: Column, salt: Long): Column =
    xxhash64(canonicalUrl, lit(salt))

  /** Bucket in [0, numBuckets) for explicit repartitioning before the
    * membership gate (BASELINE.json input_hint: "explicit repartitioning by
    * canonicalized-URL hash before the membership-filter stage"). */
  def saltedBucket(canonicalUrl: Column, salt: Long, numBuckets: Int): Column =
    pmod(saltedKey(canonicalUrl, salt), lit(numBuckets.toLong))
}
