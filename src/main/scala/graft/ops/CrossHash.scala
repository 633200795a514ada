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
  /** One digest-to-long codegen kernel — value-identical to the former
    * `conv(substring(md5(x), 1, 15), 16, 10).cast(long)` Column chain
    * (the first 15 hex digits ARE the digest's first 60 bits; equality
    * locked by TextOpsSpec) without materializing the 32-char hex
    * string, the substring, the radix-conversion string or the decimal
    * re-parse — ~3 string allocations saved per call on the hottest
    * per-token path in the engine. */
  def md5Hash60(c: Column): Column =
    graft.functions.graftfns.md5Hash60(c.cast("binary"))
}
