package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the canonical event-stream operator: a new
  * session starts when a key's inter-event gap exceeds `gapSeconds`.
  * Crawl use: per-host fetch sessions (burst detection feeding politeness
  * budgets); analytics use: user sessions over the events table.
  *
  * Scale shape: ONE shuffle on the session key, then an in-task
  * time-ordered pass — that ordering IS the semantics (sessions are
  * defined over a key's own timeline), so no formulation avoids it; Spark
  * externalizes the per-key sort (spilling, not OOM) and a key's events
  * at 10^10 rows are still one task's linear scan. Gap arithmetic is
  * exact integer MICROSECONDS (`unix_micros`), never float seconds, so
  * the DuckDB oracle (`epoch_us`) lands on identical session boundaries.
  * The streaming twin of this shape is `flatMapGroupsWithState` with an
  * event-time timeout (see graft.streaming); this is the batch operator.
  */
object Sessionize {

  /** Input rows + (session_no, is_session_start): session_no numbers a
    * key's sessions 1..n in time order. Ties within a timestamp break by
    * `idCol` so the numbering is deterministic.
    *
    * Null-timestamp rows are EXCLUDED (a row with no event time has no
    * place on the key's timeline — left in, it would poison the lag
    * arithmetic into a NULL `is_session_start` and silently fold into
    * the neighboring session); callers that must keep them route them
    * around the operator. */
  def withSessions(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    // parquet event times arrive TIMESTAMP_NTZ, which unix_micros rejects;
    // the cast reads the wall-clock value in the session zone (pinned UTC
    // by this engine's sessions) — and gap DIFFERENCES are offset-invariant
    // regardless, so session boundaries cannot move
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val isStart = prev.isNull || (us - prev > gapSeconds * 1000000L)
    events
      .filter(col(tsCol).isNotNull)
      .withColumn("is_session_start", isStart)
      .withColumn("session_no",
        sum(when(isStart, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: (key, session_no, session_start, session_end,
    * n_events) plus caller-supplied aggregates. The rollup reuses the
    * window's own (key) exchange — grouping on (key, session_no) hashes
    * to the same executors, map-side partials apply. */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, gapSeconds: Long, extraAggs: Seq[Column] = Nil): DataFrame = {
    val base = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events"))
    withSessions(events, keyCol, tsCol, idCol, gapSeconds)
      .groupBy(col(keyCol), col("session_no"))
      .agg(base.head, (base.tail ++ extraAggs): _*)
  }
}
