package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Kernel for [[RobotsVerdictExpr]] — called from generated code.
  *
  * Semantics contract (must stay in lockstep with the c25 DuckDB oracle
  * and with `Scheduler.robotsFilter`'s scaladoc):
  *   path    = canonical_url with its `scheme://authority` prefix removed
  *             (identical to regexp_replace(url, '^[a-z][a-z0-9+.-]*://[^/]*', ''))
  *   winner  = lexicographic max over matching rules of
  *             (prefix_length, prefix, allowed) — longest prefix wins,
  *             equal-length ties resolve by binary string order then
  *             allow-first
  *   verdict = -1 if no rule matches, else 0/1 = winner.allowed
  */
object RobotsKernel {

  /** byte offset where the path starts, EXACTLY mirroring the oracle's
    * anchored regexp `^[a-z][a-z0-9+.-]*://[^/]*`: the url must START with
    * a lowercase-letter-led scheme followed by "://" (canonical urls do —
    * UrlCanon lowercases the scheme); anything else leaves the WHOLE url
    * as the path, as the unanchored-match-failure of the regexp does.
    * A first-"://"-anywhere scan would diverge on non-canonical input
    * (e.g. "HTTP://h/x": regexp no-match ⇒ path = whole url; a naive scan
    * would strip the authority and change the verdict). */
  private def pathStart(url: UTF8String): Int = {
    val n = url.numBytes
    if (n == 0) return 0
    val c0 = url.getByte(0)
    if (c0 < 'a' || c0 > 'z') return 0 // no lowercase scheme ⇒ path = whole url
    var i = 1
    var b = if (i < n) url.getByte(i) else 0
    while (i < n && ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
        b == '+' || b == '.' || b == '-')) {
      i += 1
      b = if (i < n) url.getByte(i) else 0
    }
    if (i + 2 >= n || url.getByte(i) != ':' || url.getByte(i + 1) != '/' || url.getByte(i + 2) != '/')
      return 0 // scheme not followed by "://" ⇒ regexp no-match ⇒ whole url
    i += 3
    while (i < n && url.getByte(i) != '/') i += 1
    i
  }

  def verdict(url: UTF8String, rules: ArrayData): Byte = {
    val start = pathStart(url)
    val path = url.substring(start, url.numBytes)
    var bestLen = -1
    var bestPrefix: UTF8String = null
    var bestAllowed = false
    val n = rules.numElements()
    var i = 0
    while (i < n) {
      if (!rules.isNullAt(i)) {
        val r = rules.getStruct(i, 2)
        val prefix = r.getUTF8String(0)
        if (prefix != null && prefix.numBytes > 0 && path.startsWith(prefix)) {
          val allowed = r.getBoolean(1)
          val len = prefix.numChars()
          val better =
            len > bestLen ||
            (len == bestLen && {
              val c = prefix.binaryCompare(bestPrefix)
              c > 0 || (c == 0 && allowed && !bestAllowed)
            })
          if (better) { bestLen = len; bestPrefix = prefix; bestAllowed = allowed }
        }
      }
      i += 1
    }
    if (bestLen < 0) -1 else if (bestAllowed) 1 else 0
  }
}
