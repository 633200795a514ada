package graft.extract

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Visible-text extraction from fetched HTML — the step between the
  * crawler's raw page bytes and every text operator downstream (quality,
  * dedup, language-ID all score the VISIBLE text, not markup).
  *
  * The pipeline is a fixed chain over Spark's codegen'd regex builtins
  * (row-local, shuffle-free at any scale):
  *   1. drop <script>/<style> ELEMENTS (content included — it is never
  *      visible text) and comments;
  *   2. strip remaining tags to a space (block boundaries become token
  *      boundaries, never word-joins);
  *   3. decode the five core entities — AFTER tag stripping, so an
  *      encoded `&lt;b&gt;` renders as literal text instead of becoming
  *      a strippable tag, with `&amp;` LAST so `&amp;lt;` decodes to the
  *      literal `&lt;` rather than double-decoding;
  *   4. collapse whitespace.
  *
  * Every regex stays in the Java-regex ∩ RE2 dialect (inline `(?is)`
  * flags, lazy quantifiers, character classes — both engines support
  * all three identically), so the DuckDB oracle runs the VERBATIM same
  * chain. A full HTML5 parser is out of scope by design: crawl
  * pipelines run exactly this kind of tag-insensitive extraction at
  * scale (trafilatura/jusText refine it, but their core strip is this).
  */
object HtmlText {

  private val scriptPat = "(?is)<script[^>]*>.*?</script>"
  private val stylePat = "(?is)<style[^>]*>.*?</style>"
  private val commentPat = "(?s)<!--.*?-->"
  private val tagPat = "<[^>]*>"
  // find()-semantics in both engines (Spark RegExpExtract and DuckDB
  // regexp_extract both SEARCH, not full-match) — no .* anchors needed
  private val titlePat = "(?is)<title[^>]*>(.*?)</title>"

  /** The five core entities, decode order pinned (`&amp;` LAST so
    * `&amp;lt;` yields the literal `&lt;`, never a second decode) —
    * shared by body and title so the two can't diverge. */
  private def decodeEntities(c: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }

  /** The visible text of an HTML payload, whitespace-normalized. */
  def visibleText(html: Column): Column = {
    val noScript = regexp_replace(html, scriptPat, " ")
    val noStyle = regexp_replace(noScript, stylePat, " ")
    val noComment = regexp_replace(noStyle, commentPat, " ")
    val noTags = regexp_replace(noComment, tagPat, " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** The <title> content (first match), entity-decoded and trimmed;
    * empty string when the page has none. */
  def title(html: Column): Column =
    trim(decodeEntities(regexp_extract(html, titlePat, 1)))
}
