package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene step every
  * production corpus build runs before training: flag documents that
  * share word n-grams with an evaluation/benchmark set (test-set leakage;
  * the GPT-3/PaLM 13-gram-overlap procedure, here parameterized by k).
  *
  * Scale shape (the 100 TB posture):
  *  - The benchmark side is SMALL by construction (eval suites are MBs,
  *    not TBs) — its distinct n-gram set is explicitly `broadcast()`, so
  *    the probe join is map-side everywhere and the corpus never shuffles
  *    for it.
  *  - N-grams travel as the repo's 60-bit md5-prefix hash (8 bytes), not
  *    strings, so the ONE real shuffle — the per-doc hit-count aggregate —
  *    carries (id, long) rows with map-side partials. False-collision odds
  *    at 2^60 are negligible for a boolean gate (and the DuckDB oracle
  *    hashes identically, so the check is still exact).
  *  - Shingling is the same codegen'd kernel as the dedup family
  *    ([[Dedup.shingles]]); `array_distinct` runs row-local BEFORE the
  *    explode, so a document repeating one leaked gram a million times
  *    contributes one probe row.
  */
object Contamination {

  private def h60(c: Column): Column = CrossHash.md5Hash60(c)

  /** The benchmark's distinct hashed n-gram set — build once per eval
    * suite, reuse across corpus scans. */
  def benchmarkNgrams(bench: DataFrame, textCol: String, k: Int): DataFrame =
    bench
      .select(explode(array_distinct(Dedup.shingles(col(textCol), k))).as("__ng"))
      .select(h60(col("__ng")).as("__ngh"))
      .distinct()

  /** Per-document overlap verdict against a benchmark n-gram set:
    * (id, n_hits = distinct shared k-grams, contaminated = n_hits ≥
    * threshold). Every input document gets a row (zero hits included) —
    * the downstream filter is `!contaminated`. */
  def overlap(docs: DataFrame, bench: DataFrame, textCol: String,
      idCol: String, k: Int = 13, threshold: Long = 1): DataFrame = {
    val bn = broadcast(benchmarkNgrams(bench, textCol, k))
    val dn = docs
      .select(col(idCol).as("__id"),
        explode(array_distinct(Dedup.shingles(col(textCol), k))).as("__ng"))
      .select(col("__id"), h60(col("__ng")).as("__ngh"))
    val hits = dn.join(bn, "__ngh")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("__n"))
    docs.select(col(idCol).as("__id"))
      .join(hits, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_hits"),
        (coalesce(col("__n"), lit(0L)) >= threshold).as("contaminated"))
  }
}
