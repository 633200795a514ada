package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  * All are pure Column expressions (portable to the DuckDB oracle) —
  * occurrence counts use the length-difference trick rather than regex so
  * both engines compute identical integers.
  */
object TextAnalysis {

  /** number of (non-overlapping) occurrences of literal `pat` in `c`. */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("long")

  /** whitespace token count: spaces+1 on the single-space-collapsed trim. */
  def tokenCount(c: Column): Column = {
    val norm = trim(regexp_replace(c, "\\s+", " "))
    when(length(norm) === 0, 0L)
      .otherwise(occurrences(norm, " ") + 1L)
  }

  /** BPE-ish subword estimate: tokens + extra splits at 4-char boundaries
    * of long words ≈ ceil(chars/4) bounded below by word count. */
  def subwordEstimate(c: Column): Column = {
    val chars = length(regexp_replace(c, "\\s+", ""))
    greatest(tokenCount(c), ceil(chars.cast("double") / 4.0).cast("long"))
  }

  /** Per-language stopword evidence: counts of language-marker words.
    * Deterministic heuristic, shared with the oracle SQL. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of "),
    "de" -> Seq(" der ", " und ", " die "),
    "es" -> Seq(" el ", " los ", " y "),
    "fr" -> Seq(" le ", " et ", " les "))

  def langScore(c: Column, lang: String): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    langMarkers(lang).map(m => occurrences(padded, m)).reduce(_ + _)
  }

  /** argmax language with deterministic tie-break (alphabetical). */
  def langId(c: Column): Column = {
    val scored = langMarkers.keys.toSeq.sorted.map(l => struct(langScore(c, l).as("s"), lit(l).as("l")))
    // greatest(struct) picks max score, then max lang name; invert lang for
    // alphabetical-first tie-break by comparing on (score, reversed rank)
    val best = scored.reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    best.getField("l")
  }

  /** Quality score in [0,1]: length band + punctuation ratio + stopword
    * presence (the C4/Gopher-style heuristics, deterministically). */
  def qualityScore(c: Column): Column = {
    val n = length(c).cast("double")
    val toks = tokenCount(c).cast("double")
    val punct = (occurrences(c, ".") + occurrences(c, ",") + occurrences(c, "!")).cast("double")
    val lengthOk = when(n >= 32 && n <= 100000, 0.4).otherwise(0.0)
    val tokenOk = when(toks >= 5, 0.3).otherwise(0.0)
    val punctOk = when(punct / greatest(toks, lit(1.0)) <= 0.3, 0.3).otherwise(0.0)
    round(lengthOk + tokenOk + punctOk, 1)
  }

  /** Document fingerprint: md5 of the lowercased, whitespace-collapsed
    * text (rolling-hash analog, portable). */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(lower(c), "\\s+", " ")).cast("binary"))

  // ------------------------------------------------------------ PII --
  // Training-data PII scrub: detect + redact emails / phone numbers /
  // IPv4 addresses before anything reaches a training corpus. The
  // patterns stay in the dialect-safe intersection of Java regex (Spark)
  // and RE2 (the DuckDB oracle): character classes, bounded repetition
  // and ASCII \b only — no backreferences, no lookaround. Spark's
  // RegExpReplace/RegExpExtractAll are codegen'd builtins, so the whole
  // scrub is row-local, shuffle-free, and inside WholeStageCodegen at
  // any scale.

  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** match count of `pattern` in `c` (global). */
  def piiCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Redact all three PII classes with typed placeholders. Order is part
    * of the contract (emails first — their local/domain parts may contain
    * digits and dots that the narrower patterns could then half-match):
    * email → ipv4 → phone, pinned identically in the oracle SQL. */
  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, emailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, ipv4Pattern, "<IP>")
    regexp_replace(noIp, phonePattern, "<PHONE>")
  }
}
