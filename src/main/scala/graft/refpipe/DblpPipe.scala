package graft.refpipe

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's E2 release pipeline (`download_and_filter_release`,
  * csinsights/client/dblpclient.py:252-306) on NATIVE record shapes — the
  * xmltodict view produced by [[graft.sources.XmlIngest]] — with the
  * reference's EXACT filter semantics, including its sharp edges:
  *
  *  - F1 timestamp filter (dblpclient.py:104-123): STRICTLY greater than
  *    `from`; a record with a missing `@mdate` RAISES (the reference
  *    strptime's `str(None)`), it is not silently dropped;
  *  - F2 access filter (dblpclient.py:126-145): a record with NO `ee`
  *    element defaults to CLOSED (admitted iff CLOSED is requested), while
  *    a record whose `ee` exists but has NO type attribute is dropped for
  *    every requested set (None ∉ access_types) — present-without-type and
  *    absent are DIFFERENT;
  *  - F3 composition (dblpclient.py:287-297): when filtering is enabled
  *    the access filter is ALWAYS built and applied; requesting
  *    AccessType.ALL with filters on is an ERROR in the reference (the
  *    `access_filter` local is never bound, `filters.extend` raises
  *    UnboundLocalError) — mirrored here as IllegalStateException rather
  *    than silently skipping the filter.
  */
object DblpPipe {

  val AccessAll = "all"

  /** F1: keep records with `to_date(mdate) > from`. Missing mdate raises
    * (per-row `raise_error`, matching the reference's strptime crash). */
  def timestampFilter(records: DataFrame, fromDate: String): DataFrame =
    records.filter(
      when(col("mdate").isNull,
        raise_error(lit("record has no @mdate (reference raises here)")))
        .otherwise(to_date(col("mdate"), "yyyy-MM-dd") > to_date(lit(fromDate))))

  /** F2: access gate over the xmltodict `ee` view: missing ee → CLOSED
    * default; present ee with null type → NULL, which `isin` rejects for
    * every set (exactly the reference's `None ∉ access_types`). */
  def accessFilter(records: DataFrame, accessTypes: Seq[String]): DataFrame = {
    val access = when(!col("eePresent"), lit("closed")).otherwise(col("eeType"))
    records.filter(access.isin(accessTypes: _*))
  }

  /** F3: the composed E2 filter chain. */
  def downloadAndFilterRelease(
      records: DataFrame,
      useFilters: Boolean,
      accessTypes: Seq[String],
      fromDate: String = "1980-01-01"): DataFrame = {
    if (!useFilters) records
    else if (accessTypes.contains(AccessAll))
      // dblpclient.py:287-297: with filters on, AccessType.ALL leaves
      // `access_filter` unbound and the extend raises — not a silent skip
      throw new IllegalStateException(
        "AccessType.ALL with filters enabled raises in the reference " +
          "(unbound access_filter, dblpclient.py:293-297)")
    else accessFilter(timestampFilter(records, fromDate), accessTypes)
  }
}
