package graft.sched

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Politeness scheduler: a per-host priority queue expressed as
  * window-ranked micro-batches (north_rule). No driver-side queue — the
  * entire schedule is one declarative plan:
  *
  *   rk       = row_number over (partition by host, order by priority,
  *              seed_rank, canonical_url)          — deterministic total
  *              order per host (Spark sort is not stable; the explicit
  *              canonical_url tiebreak makes rank reproducible, SURVEY O1)
  *   batch_id = (rk-1) / budget                    — host emits ≤budget
  *              urls per micro-batch
  *
  * Reference-equivalence mode (csinsights/client/s2client.py:153-156 —
  * strictly sequential fetches): `hostCol = lit("*")`, budget = 1 →
  * batch_id == global rank == the reference's fetch index.
  *
  * Scale: the only shuffle is the window partition-by host. Host skew is
  * real (Zipf) but the window does not need the whole host partition in
  * memory at once (Spark windows spill); the *fetch* stage re-partitions
  * by salted url hash so hot hosts do not serialize execution.
  */
object Scheduler {

  /** Adds host, rk, batch_id, rank_in_batch to a canonical frontier. */
  def schedule(
      frontier: DataFrame, // canonical_url, host, priority, seed_rank
      budgets: Option[DataFrame], // (host, budget); broadcast dim
      defaultBudget: Int,
      hostCol: Column = col("host")): DataFrame = {
    val withBudget = budgets match {
      case Some(b) =>
        frontier.join(broadcast(b.select(col("host"), col("budget"))),
            frontier("host") === b("host"), "left")
          .drop(b("host"))
          .withColumn("budget", coalesce(col("budget"), lit(defaultBudget)))
      case None => frontier.withColumn("budget", lit(defaultBudget))
    }
    val w = Window.partitionBy(hostCol)
      .orderBy(col("priority"), col("seed_rank"), col("canonical_url"))
    withBudget
      .withColumn("rk", row_number().over(w))
      .withColumn("batch_id", ((col("rk") - 1) / col("budget")).cast("long"))
      .withColumn("rank_in_batch", ((col("rk") - 1) % col("budget")).cast("int"))
      .drop("budget")
  }

  /** Skew-resistant variant of [[schedule]] for hot hosts (north_rule:
    * "salted-hash partitioned to kill host-key skew"). A plain window
    * partitioned by host puts a Zipf-hot host's entire frontier in ONE
    * task — a serial fraction no cluster size can fix (measured: host 0
    * carries ~22% of the synthetic frontier). Instead:
    *
    *   1. rank within (host, band) where band = the priority value — a
    *      monotone prefix of the sort key, so band boundaries respect the
    *      global per-host order;
    *   2. count rows per (host, band) and prefix-sum the counts over bands
    *      (a tiny hosts×bands aggregate);
    *   3. global per-host rank = band offset + in-band rank.
    *
    * Bit-identical to the single-window rank (asserted in CrawlOrderSpec)
    * but the hot host now spreads over (#bands) tasks.
    *
    * Requires an integral, bounded `priority` (ours is 0..99); falls back
    * to [[schedule]] semantics otherwise.
    */
  def scheduleBanded(
      frontier: DataFrame,
      budgets: Option[DataFrame],
      defaultBudget: Int): DataFrame = {
    val wBand = Window.partitionBy(col("host"), col("priority"))
      .orderBy(col("seed_rank"), col("canonical_url"))
    val inBand = frontier.withColumn("__r", row_number().over(wBand))
    // Band offsets need only COUNTS per (host, band) — a map-side-partial
    // HashAggregate straight off the frontier, not a second consumption of
    // the windowed stream (count(*) over the band window would sort-rescan
    // every row just to keep one row per band). The offsets table is
    // hosts×bands rows; its prefix-sum window is trivially small.
    val wOff = Window.partitionBy(col("__ohost")).orderBy(col("__oprio"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = frontier
      .groupBy(col("host").as("__ohost"), col("priority").as("__oprio"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__ohost"), col("__oprio"), col("__off"))
    val ranked = inBand
      .join(broadcast(offsets),
        col("host") === col("__ohost") && col("priority") === col("__oprio"))
      .withColumn("rk", (col("__off") + col("__r")).cast("int"))
      .drop("__r", "__off", "__ohost", "__oprio")
    val withBudget = budgets match {
      case Some(b) =>
        ranked.join(broadcast(b.select(col("host").as("__bhost"), col("budget"))),
            col("host") === col("__bhost"), "left")
          .drop("__bhost")
          .withColumn("budget", coalesce(col("budget"), lit(defaultBudget)))
      case None => ranked.withColumn("budget", lit(defaultBudget))
    }
    withBudget
      .withColumn("batch_id", ((col("rk") - 1) / col("budget")).cast("long"))
      .withColumn("rank_in_batch", ((col("rk") - 1) % col("budget")).cast("int"))
      .drop("budget")
  }

  /** Order-respecting bucket assignment — the shared prelude of
    * [[globalRank]] and [[globalPrefixSum]]. Emits a `__pid` column such
    * that key order implies bucket order and equal keys share a bucket;
    * boundaries never affect correctness (offsets come from actual
    * per-bucket counts), only balance.
    *
    * Two shapes, picked by the leading key's type:
    *  - numeric/date/timestamp leading key → buckets from an
    *    approx-quantile sketch of THAT KEY ALONE (a column-pruned scan,
    *    never the full row; long→double cast is monotone, so a row
    *    lands on one side of every cut consistently). The `__pid`
    *    column is then a plain projection, and the in-bucket window's
    *    own hash exchange is the ONLY corpus shuffle.
    *  - otherwise (or when the sketch shows the key is too low-
    *    cardinality to fill half the buckets) → `repartitionByRange` on
    *    the FULL key + `spark_partition_id`. Costs a second exchange
    *    (range, then the window's hash on the partition id) — the
    *    window's ClusteredDistribution(__pid) is not satisfied by
    *    RangePartitioning(orderCols) — but handles arbitrary key types
    *    and spreads heavy leading-key ties by the tiebreakers. */
  private def orderBuckets(df: DataFrame, orderCols: Seq[Column], n: Int): DataFrame = {
    import org.apache.spark.sql.types._
    // The whole sketch attempt is a PROBE with a correct fallback (bucket
    // placement never affects correctness), so any failure — notably a
    // SortOrder leading column (col(...).desc), which resolves in a
    // projection's schema but is Unevaluable at codegen when the quantile
    // sketch casts it — routes to the range path instead of throwing.
    val cuts: Array[Double] =
      if (n <= 1) Array.empty
      else scala.util.Try {
        df.select(orderCols.head.as("__k")).schema.head.dataType match {
          case _: NumericType | DateType | TimestampType =>
            val probs = (1 until n).map(_.toDouble / n).toArray
            df.select(orderCols.head.cast("double").as("__k"))
              .stat.approxQuantile("__k", probs, 1.0 / (100.0 * n))
              .distinct.sorted
          case _ => Array.empty[Double]
        }
      }.getOrElse(Array.empty)
    if (cuts.length >= n / 2) {
      val k = orderCols.head.cast("double")
      // null leading key: every comparison is null → otherwise(0) →
      // bucket 0, the front — where nulls-first ordering puts those rows
      val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(k > lit(c), 1).otherwise(0)
      }
      df.withColumn("__pid", bucket)
    } else {
      df.repartitionByRange(n, orderCols: _*).withColumn("__pid", spark_partition_id())
    }
  }

  /** Distributed global row_number: bit-identical to
    * `row_number over (order by keys)` — which moves EVERY row to one task
    * (WindowExec single-partition warning; a serial total order no cluster
    * size can fix) — but computed scalably:
    *
    *   1. assign order-respecting buckets ([[orderBuckets]]: quantile
    *      sketch of the leading key when numeric — one corpus shuffle
    *      total — else range partitions on the full key);
    *   2. rank + count within each bucket;
    *   3. global rank = prefix-sum offset of preceding buckets + local
    *      rank. The offsets table is #buckets rows — its own window is
    *      trivially small — and joins back via broadcast.
    *
    * Correctness does not depend on where the bucket boundaries land:
    * offsets come from the actual per-bucket counts. Callers must make
    * the key total (explicit tiebreakers) exactly as they would for the
    * single-window form. */
  def globalRank(df: DataFrame, orderCols: Seq[Column], rankCol: String,
      parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = orderBuckets(df, orderCols, n)
    val wIn = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val inPart = ranged.withColumn("__r", row_number().over(wIn))
    // per-bucket counts via groupBy, NOT a window over the shuffled corpus:
    // partial aggregation runs map-side, so this branch's exchange carries
    // ≤ #maps × #buckets partial rows — never the corpus a second time
    val wOff = Window.orderBy(col("__opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid").as("__opid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__opid"), col("__off"))
    inPart
      .join(broadcast(offsets), col("__pid") === col("__opid"))
      // rank is LONG: an int overflows past 2^31 rows (the 10^10 posture),
      // and the DuckDB twin's row_number() is BIGINT anyway
      .withColumn(rankCol, col("__off") + col("__r"))
      .drop("__pid", "__r", "__opid", "__off")
  }

  /** Distributed EXCLUSIVE prefix sum over a total order — the running-
    * offset primitive behind shard packing (k5): `outCol` = sum of
    * `valueCol` over all rows strictly before this one in `orderCols`
    * order. Same two-pass shape as [[globalRank]] (a single global
    * `sum over (order by ...)` window moves every row to ONE task):
    * assign order-respecting buckets ([[orderBuckets]] — quantile sketch
    * of a numeric leading key makes the in-bucket window's hash exchange
    * the only corpus shuffle), running sum + bucket total inside each
    * bucket, prefix-sum the #buckets-row totals table, broadcast the
    * offsets back. Bit-identical to the single-window form
    * (SchedulerSpec) for any total `orderCols`; correctness never
    * depends on where the bucket boundaries land. */
  def globalPrefixSum(df: DataFrame, orderCols: Seq[Column], valueCol: Column,
      outCol: String, parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = orderBuckets(df, orderCols, n)
      .withColumn("__v", valueCol.cast("long"))
    val wRun = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPart = ranged
      .withColumn("__run", coalesce(sum(col("__v")).over(wRun), lit(0L)))
    // per-bucket totals via groupBy (map-side partials) — see globalRank
    val wOff = Window.orderBy(col("__opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid").as("__opid"))
      .agg(sum(col("__v")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__opid"), col("__off"))
    inPart
      .join(broadcast(offsets), col("__pid") === col("__opid"))
      .withColumn(outCol, col("__off") + col("__run"))
      .drop("__pid", "__v", "__run", "__opid", "__off")
  }

  /** PER-GROUP exclusive prefix sum — `outCol` = sum of `valueCol` over
    * rows of the SAME group strictly before this one in `orderCols` order.
    * The naive form (`sum over (partition by group order by ...)`) puts
    * each whole group in one task — the hot-group trap at 10^10 rows,
    * where one source/language/bucket dominates the corpus. Here the
    * buckets come from [[orderBuckets]] over the ORDER key alone (a
    * numeric leading key — the callers' id/hash — takes the
    * quantile-sketch path, so the group column's type and cardinality
    * never force a range pass), the in-bucket running sums window on
    * (bucket, group) — every group is spread across ALL buckets, so a
    * hot group rides ~#buckets tasks instead of one — and the
    * per-(group, bucket) offsets table (#groups × #buckets rows, its own
    * window partitioned by group over the tiny table) joins back via
    * broadcast. ONE corpus shuffle total, same as [[globalPrefixSum]].
    * Bit-identical to the single-window form (SchedulerSpec) for any
    * per-group-total `orderCols`; group count must be broadcast-small
    * (it is a dimension — sources, languages, AR buckets), group SIZE
    * is unbounded. */
  def groupedPrefixSum(df: DataFrame, groupCol: String, orderCols: Seq[Column],
      valueCol: Column, outCol: String, parts: Int = 0): DataFrame = {
    val n = if (parts > 0) parts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = orderBuckets(df, orderCols, n)
      .withColumn("__v", valueCol.cast("long"))
    val wRun = Window.partitionBy(col("__pid"), col(groupCol))
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inPart = ranged
      .withColumn("__run", coalesce(sum(col("__v")).over(wRun), lit(0L)))
    val wOff = Window.partitionBy(col("__ogrp")).orderBy(col("__opid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__pid").as("__opid"), col(groupCol).as("__ogrp"))
      .agg(sum(col("__v")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .select(col("__opid"), col("__ogrp"), col("__off"))
    inPart
      .join(broadcast(offsets),
        col("__pid") === col("__opid") && col(groupCol) <=> col("__ogrp"))
      .withColumn(outCol, col("__off") + col("__run"))
      .drop("__pid", "__v", "__run", "__opid", "__ogrp", "__off")
  }

  /** robots.txt gate: drop urls whose path matches a disallowed prefix for
    * their host; among matching rules the LONGEST prefix wins (standard
    * robots precedence; exact-length ties resolve allow-first). `robots` is
    * a small dimension (host, path_prefix, allowed) AGGREGATED to one
    * rules-array row per host before the broadcast join — a host with many
    * rules must not duplicate its frontier rows (a bare left join would
    * silently inflate the frontier per extra rule). Empty/null prefix = no
    * restriction; hosts with no rules pass. */
  def robotsFilter(frontier: DataFrame, robots: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val perHost = robots
      .filter(col("path_prefix").isNotNull && col("path_prefix") =!= "")
      .groupBy(col("host").as("__rhost"))
      .agg(collect_list(struct(
        col("path_prefix").as("prefix"),
        col("allowed").as("allowed"))).as("__rules"))
    // longest matching rule by (prefix_len, prefix, allowed) lexicographic
    // max — equal (len, prefix) resolves allowed=true (allow beats
    // disallow). One codegen'd kernel call per row (RobotsVerdictExpr);
    // the HOF array_max(filter(...)) form is CodegenFallback and cost
    // ~1.6s/600k rows interpreted.
    val verdict = Bridge.column(graft.functions.RobotsVerdictExpr(
      Bridge.expression(col("canonical_url")),
      Bridge.expression(col("__rules"))))
    frontier
      .join(broadcast(perHost), col("host") === col("__rhost"), "left")
      .withColumn("__verdict", verdict)
      .filter(col("__verdict").isNull || col("__verdict"))
      .drop("__rhost", "__rules", "__verdict")
  }

  /** Frontier dedup: first occurrence wins, where "first" is the
    * deterministic schedule order (priority, seed_rank). Reference analog:
    * seen-set admits the first corpusid encountered in file order
    * (csinsights/data/s2processor.py:55-61).
    *
    * The ordering tuple is PACKED into one BIGINT —
    * `priority(13b) | seed_rank(44b) | depth(6b)` — because `min(struct)`
    * plans as SortAggregate (struct buffers are not hash-aggregatable)
    * which degrades to spilling per-partition re-sorts at larger N
    * (measured 1147s CPU vs 31s at 16M rows). `min(bigint)` is a plain
    * HashAggregate with map-side partials. min(packed) = lexicographic
    * (priority, seed_rank, depth); host re-derives from the canonical url
    * (cheap kernel). Bounds (priority < 8192, seed_rank < 2^44, depth <
    * 64) are asserted by the packing being order-preserving within them —
    * callers with wilder domains use [[dedupFrontierGeneral]]. */
  def dedupFrontier(frontier: DataFrame): DataFrame = {
    val packed = shiftleft(col("priority"), 50)
      .bitwiseOR(shiftleft(col("seed_rank"), 6))
      .bitwiseOR(col("depth").cast("long"))
    frontier
      .groupBy(col("canonical_url"))
      .agg(min(packed).as("__p"))
      .select(col("canonical_url"),
        shiftright(col("__p"), 50).as("priority"),
        shiftright(col("__p"), 6).bitwiseAND((1L << 44) - 1).as("seed_rank"),
        graft.canon.UrlCanon.hostOf(col("canonical_url")).as("host"),
        col("__p").bitwiseAND(63L).cast("int").as("depth"))
  }

  /** struct-min variant for unbounded ordering domains (SortAggregate). */
  def dedupFrontierGeneral(frontier: DataFrame): DataFrame = {
    frontier
      .groupBy(col("canonical_url"))
      .agg(min(struct(col("priority"), col("seed_rank"), col("host"), col("depth")))
        .as("__first"))
      .select(col("canonical_url"),
        col("__first.priority").as("priority"),
        col("__first.seed_rank").as("seed_rank"),
        col("__first.host").as("host"),
        col("__first.depth").as("depth"))
  }
}
