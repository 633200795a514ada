package graft

import org.apache.spark.sql.functions._

import graft.extract.HtmlText
import graft.ops.{Contamination, Sessionize, TextAnalysis}

/** Semantic tests for the round-5 text/event operators: benchmark
  * decontamination, PII scrub, HTML visible-text extraction, gap
  * sessionization. */
class TextOpsSpec extends SparkSpec {

  // ------------------------------------------------------ contamination --
  test("contamination: leaked k-gram flags the doc; clean docs report zero hits") {
    import spark.implicits._
    val bench = Seq((0L, "what is the capital city of france exactly")).toDF("qid", "text")
    val docs = Seq(
      (1L, "some training text mentioning the capital city of france exactly here"), // leaked 5-gram
      (2L, "completely unrelated words about spark shuffles and partitions"),
      (3L, "short")).toDF("doc_id", "text")
    val out = Contamination.overlap(docs, bench, "text", "doc_id", k = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L)._1 > 0 && out(1L)._2)
    assert(out(2L) == (0L, false))
    assert(out(3L) == (0L, false)) // shorter than k tokens → no shingles, still a row
    assert(out.size == 3)
  }

  test("contamination: a gram repeated in the doc counts once (distinct overlap)") {
    import spark.implicits._
    val bench = Seq((0L, "a b c d e")).toDF("qid", "text")
    val rep = ("a b c d e " * 10).trim
    val docs = Seq((1L, rep)).toDF("doc_id", "text")
    val out = Contamination.overlap(docs, bench, "text", "doc_id", k = 5).collect()
    // distinct 5-grams of the repetition: abcde, bcdea, cdeab, deabc, eabcd
    // — but only 'a b c d e' is in the benchmark
    assert(out.head.getLong(1) == 1L)
  }

  test("contamination: benchmark probe join is a broadcast (corpus never shuffles for it)") {
    import spark.implicits._
    val bench = Seq((0L, "a b c d e")).toDF("qid", "text")
    val docs = (0 until 100).map(i => (i.toLong, s"doc $i words a b c d e")).toDF("doc_id", "text")
    val plan = Contamination.overlap(docs, bench, "text", "doc_id", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$plan")
  }

  // ---------------------------------------------------------------- PII --
  test("pii: counts and redaction on a crafted line (email → ip → phone order)") {
    import spark.implicits._
    val df = Seq((1L,
      "write to jane.doe+x@sub.example.co or call 555-123-4567 from 192.168.0.1 ok"))
      .toDF("doc_id", "body")
    val r = df.select(
      TextAnalysis.piiCount(col("body"), TextAnalysis.emailPattern).as("e"),
      TextAnalysis.piiCount(col("body"), TextAnalysis.phonePattern).as("p"),
      TextAnalysis.piiCount(col("body"), TextAnalysis.ipv4Pattern).as("i"),
      TextAnalysis.redactPii(col("body")).as("red")).head()
    assert(r.getLong(0) == 1 && r.getLong(1) == 1 && r.getLong(2) == 1)
    assert(r.getString(3) ==
      "write to <EMAIL> or call <PHONE> from <IP> ok")
  }

  test("pii: clean text untouched; dotted-number-in-domain not double-redacted") {
    import spark.implicits._
    val df = Seq(
      (1L, "no personal data here just words"),
      // the email's domain contains an IPv4-looking dotted run — the
      // email pass must consume it whole before the ip pass runs
      (2L, "ping admin@10.0.0.1.example.com now")).toDF("doc_id", "body")
    val out = df.select(col("doc_id"), TextAnalysis.redactPii(col("body")).as("red"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "no personal data here just words")
    assert(out(2L) == "ping <EMAIL> now")
  }

  // --------------------------------------------------------------- html --
  test("html: script/style/comment content never leaks; entities decode AFTER tag strip") {
    import spark.implicits._
    val html = "<html><head><title>T &amp; U</title>" +
      "<script>if (1 < 2) { hidden(); }</script><style>.x{a:b}</style></head>" +
      "<body><h1>Head</h1><!-- secret --><p>alpha &lt;b&gt; beta</p></body></html>"
    val df = Seq((1L, html)).toDF("doc_id", "html")
    val r = df.select(
      HtmlText.title(col("html")).as("t"),
      HtmlText.visibleText(col("html")).as("v")).head()
    assert(r.getString(0) == "T & U")
    // encoded <b> stays literal text (decode happens after stripping);
    // script body, style body, comment body all gone
    assert(r.getString(1) == "T & U Head alpha <b> beta")
  }

  test("html: missing title is empty; bare text passes through; whitespace collapses") {
    import spark.implicits._
    val df = Seq((1L, "plain   text\n\twith   gaps")).toDF("doc_id", "html")
    val r = df.select(HtmlText.title(col("html")), HtmlText.visibleText(col("html"))).head()
    assert(r.getString(0) == "")
    assert(r.getString(1) == "plain text with gaps")
  }

  // --------------------------------------------------------- sessionize --
  test("sessionize: gap splits sessions; numbering is per-key and time-ordered") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val events = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(60)),          // session 1 of user 10
      (3L, 10L, ts(60 + 1801)),                     // gap 1801s > 1800 → session 2
      (4L, 10L, ts(60 + 1801 + 1800)),              // gap exactly 1800 → SAME session
      (5L, 20L, ts(5))                              // other user: own numbering
    ).toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessions(events, "user_id", "ts", "event_id", gapSeconds = 1800)
      .orderBy("user_id", "session_no")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(out.toSeq == Seq((10L, 1L, 2L), (10L, 2L, 2L), (20L, 1L, 1L)))
  }

  test("sessionize: null-timestamp rows are excluded, never folded into a neighbor session") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq((1L, 1L, Option(t)), (2L, 1L, None), (3L, 1L, Option(t)))
      .toDF("event_id", "user_id", "ts")
    val rows = Sessionize.withSessions(events, "user_id", "ts", "event_id", 1800).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("is_session_start"))))
  }

  test("sessionize: simultaneous timestamps break ties by id — deterministic numbering") {
    import spark.implicits._
    val t = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq((2L, 1L, t), (1L, 1L, t)).toDF("event_id", "user_id", "ts")
    val rows = Sessionize.withSessions(events, "user_id", "ts", "event_id", 1800)
      .orderBy("event_id").collect()
    // both in one session; the id-1 row is the session start
    assert(rows.map(_.getAs[Long]("session_no")).toSeq == Seq(1L, 1L))
    assert(rows.map(_.getAs[Boolean]("is_session_start")).toSeq == Seq(true, false))
  }
}
