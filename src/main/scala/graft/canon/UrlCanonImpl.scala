package graft.canon

/** Scalar kernels for URL canonicalization — called from the codegen'd
  * [[graft.functions.CanonicalUrlExpr]]/[[graft.functions.HostOfExpr]].
  *
  * Why a kernel and not Column arithmetic: composing the same logic from
  * substring/instr Columns duplicates the shared sub-expressions
  * exponentially in the tree ("prefix" appears 6x, each copy containing
  * "afterScheme", ...), and the generated Java blows the JVM's 64 KB
  * method limit — Spark then silently disables whole-stage codegen and
  * the whole stage runs interpreted (measured ~150μs/row). This kernel is
  * a few indexOf calls.
  *
  * Semantics (must stay in lockstep with graft.refsim.ReferenceSim's
  * regex twin and the DuckDB oracle SQL — locked by UrlCanonSpec and
  * tools/local_verify.py):
  *   1. strip the fragment;  2. lowercase scheme://host[:port];
  *   3. strip default ports :80/:443.
  */
object UrlCanonImpl {

  def canonicalize(url: String): String = {
    val hash = url.indexOf('#')
    val nofrag = if (hash >= 0) url.substring(0, hash) else url
    val sep = nofrag.indexOf("://")
    if (sep < 0) return nofrag
    val slash = nofrag.indexOf('/', sep + 3)
    val prefixEnd = if (slash < 0) nofrag.length else slash
    var prefix = lowerAscii(nofrag, 0, prefixEnd)
    if (prefix.endsWith(":443")) prefix = prefix.substring(0, prefix.length - 4)
    else if (prefix.endsWith(":80")) prefix = prefix.substring(0, prefix.length - 3)
    if (prefixEnd == nofrag.length) prefix
    else prefix + nofrag.substring(prefixEnd)
  }

  def host(url: String): String = {
    val hash = url.indexOf('#')
    val nofrag = if (hash >= 0) url.substring(0, hash) else url
    val sep = nofrag.indexOf("://")
    if (sep < 0) return ""
    val start = sep + 3
    var end = start
    while (end < nofrag.length && {
        val c = nofrag.charAt(end); c != '/' && c != '?' && c != ':'
      }) end += 1
    lowerAscii(nofrag, start, end)
  }

  /** locale-independent lowercase of [from, until) — matches Spark/DuckDB
    * `lower` on the ASCII-only scheme/host domain. Non-ASCII chars defer
    * to Character.toLowerCase (same as UTF8String.toLowerCase per char). */
  private def lowerAscii(s: String, from: Int, until: Int): String = {
    val arr = new Array[Char](until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      arr(i - from) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else Character.toLowerCase(c)
      i += 1
    }
    new String(arr)
  }
}
