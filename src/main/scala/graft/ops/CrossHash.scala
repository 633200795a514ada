package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The repo-standard CROSS-ENGINE hash: 60-bit md5-prefix of a value,
  * reproducible in the DuckDB oracle as
  * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. One definition —
  * simhash token lanes (d3), sampling ranks (s1/e1), contamination
  * n-gram probes (t6) and every matching oracle derive from it; a width
  * or derivation change edited anywhere else would silently diverge one
  * engine from the other on some query family. */
object CrossHash {
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
}
