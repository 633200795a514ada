package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.fetch.Fetch
import graft.sched.Scheduler
import graft.tableio.SnapshotTable

/** Structured-Streaming face of the engine.
  *
  * The politeness scheduler cannot use `row_number` on a streaming DF
  * (unsupported), so ranking happens INSIDE each micro-batch via
  * `foreachBatch` — which is also the deterministic commit point
  * (SURVEY.md §7 hard part 5). Checkpointing = Spark's streaming
  * checkpointLocation (offsets) + our snapshot tables (data), both
  * idempotent per batch_id, so kill-and-restart resumes exactly.
  */
object Streaming {

  /** Windowed event aggregation with watermark — the late-data shape the
    * batch engine lacks (SURVEY §2.7). Returns the streaming DF; callers
    * start it with their own sink/trigger. */
  def windowedEventCounts(spark: SparkSession, eventsPath: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(eventsPath)
      // watermarks require TIMESTAMP (parquet micros arrive as NTZ);
      // session tz is pinned UTC so the instant labels match the batch twin
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermark-bounded streaming dedup — the at-least-once redelivery
    * gate (an upstream fetcher/queue that retries delivers some events
    * twice; exactly-once analytics must drop the copies). Spark's
    * `dropDuplicatesWithinWatermark` keys state by event_id and evicts an
    * id once the watermark passes its event time + delay, so state is
    * O(ids inside the delay window), not O(all ids ever) — the only
    * dedup shape that survives 10^10 events. The contract is airtight
    * within the delay: a redelivery inside it hits live state and is
    * suppressed; a redelivery OLDER than the watermark arrives late and
    * is dropped by the watermark itself — there is no gap where a
    * duplicate slips through, the delay only bounds how much state the
    * guarantee costs. Batch twin: st6 (plain dropDuplicates); stream ≡
    * batch asserted in StreamingSpec. */
  def dedupedEvents(spark: SparkSession, eventsPath: String,
      schema: StructType, delay: String = "2 hours"): DataFrame =
    spark.readStream.schema(schema).parquet(eventsPath)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")

  /** [[dedupedEvents]] composed with st1's windowed aggregation — the
    * full redelivery-safe metrics pipeline (dedup state AND agg state
    * both watermark-bounded). */
  def dedupedEventCounts(spark: SparkSession, eventsPath: String,
      schema: StructType, delay: String = "2 hours"): DataFrame =
    dedupedEvents(spark, eventsPath, schema, delay)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Session-window aggregation with watermark — Catalyst's NATIVE
    * merging-sessions operator (no hand-rolled state): in streaming it is
    * state-store-backed and a session finalizes exactly when the
    * watermark passes its end (last event + gap). Prefer this to a
    * `flatMapGroupsWithState` sessionizer — the built-in merges partial
    * sessions map-side and its state is managed/evictable. Batch twin:
    * `st3_session_window`; stream ≡ batch asserted in StreamingSpec. */
  def sessionizedEventSums(spark: SparkSession, eventsPath: String,
      schema: StructType, gap: String = "30 minutes"): DataFrame =
    spark.readStream.schema(schema).parquet(eventsPath)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("w.start").cast("timestamp_ntz").as("session_start"),
        col("w.end").cast("timestamp_ntz").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join with watermarked state — click-through
    * attribution (each click joined to the same user's views from the
    * preceding `windowMinutes`): the Structured Streaming shape where
    * BOTH sides buffer in the state store and the time-range condition +
    * watermarks bound that state — a view older than the window plus the
    * watermark delay can never match a future click, so the store evicts
    * it (without the range condition, stream-stream join state grows
    * unboundedly at 10^10 events). Inner-join matches emit as they
    * arrive; the watermark governs EVICTION, not emission. Batch twin:
    * `st4_interval_join`; stream ≡ batch asserted in StreamingSpec. */
  def clickAttribution(spark: SparkSession, eventsPath: String,
      schema: StructType, windowMinutes: Int = 240): DataFrame = {
    def side(kind: String, idAs: String, userAs: String, tsAs: String) =
      spark.readStream.schema(schema).parquet(eventsPath)
        .filter(col("event_type") === kind)
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          col("ts").cast("timestamp").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val views = side("view", "view_id", "v_user", "view_ts")
    val clicks = side("click", "click_id", "c_user", "click_ts")
    views.join(clicks,
        col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        (unix_micros(col("click_ts")) - unix_micros(col("view_ts"))).as("gap_us"))
  }

  /** Per-host crawl-state row for the stateful politeness limiter. */
  final case class HostState(granted: Long, deferred: Long)
  final case class GrantDecision(host: String, canonical_url: String,
      granted: Boolean, host_total_granted: Long)

  /** Stateful per-host admission over a STREAM of frontier candidates:
    * each host keeps a running grant count in
    * `flatMapGroupsWithState`-managed state and admits at most
    * `budgetPerBatch` urls per micro-batch, deferring the rest — the
    * custom-state form of the politeness budget (the window-rank form
    * lives in [[graft.sched.Scheduler]]; this one survives across batches
    * in the state store and so enforces budgets over TIME, which a
    * per-batch window cannot).
    *
    * Determinism: within a batch, grants go to the lexicographically
    * smallest canonical urls (state stores only counters, so admission
    * must not depend on arrival order).
    *
    * Memory: O(budgetPerBatch) per host group, NOT O(group). A Zipf-hot
    * host's slice of a 10^10-regime micro-batch can be ~20% of the batch;
    * sorting it in one task's heap is the same all-in-one-task shape
    * `Scheduler.scheduleBanded` exists to kill. Instead a single pass
    * keeps a size-budget max-heap of the smallest urls seen so far and
    * STREAMS each deferral out the moment it is decided: once the heap is
    * full, whichever of (incoming url, heap max) is larger provably isn't
    * among the batch's budget smallest — and every deferred row's
    * `host_total_granted` is `base + budget` exactly (deferrals exist only
    * when the group exceeds the budget). Grant decisions follow once the
    * input is exhausted. The state update rides the tail of the returned
    * iterator — legal because `FlatMapGroupsWithStateExec` commits group
    * state via a completion iterator AFTER the output is drained.
    */
  def statefulHostLimiter(
      candidates: org.apache.spark.sql.Dataset[(String, String)], // (host, canonical_url)
      budgetPerBatch: Int): org.apache.spark.sql.Dataset[GrantDecision] = {
    import candidates.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    candidates
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        limitGroup(budgetPerBatch))
  }

  /** Per-group kernel of [[statefulHostLimiter]], factored out so specs
    * can drive it with a `TestGroupState` (incl. PARTIAL drains).
    *
    * Drain contract: the output is lazy and state rides it, so a
    * downstream that stops pulling mid-group must never observe emitted
    * rows AHEAD of state. Deferrals therefore update `HostState.deferred`
    * incrementally BEFORE each row is emitted (O(1) in-memory update per
    * row), and the grant path updates state once before the first grant is
    * emitted — at every prefix of the output, state ≥ emitted
    * (StreamingSpec "partial drain" test). A fully drained group ends with
    * exactly the old eager semantics. */
  private[graft] def limitGroup(budgetPerBatch: Int)(
      host: String,
      rows: Iterator[(String, String)],
      state: org.apache.spark.sql.streaming.GroupState[HostState]): Iterator[GrantDecision] = {
    val st = state.getOption.getOrElse(HostState(0L, 0L))
    val base = st.granted
    val k = math.max(budgetPerBatch, 0)
    // max-heap of the k lexicographically-smallest urls so far
    val heap = new java.util.PriorityQueue[String](
      math.max(k, 1), java.util.Collections.reverseOrder[String]())
    var deferredN = 0L
    def deferRow(u: String, hostTotal: Long): Iterator[GrantDecision] = {
      deferredN += 1
      // state BEFORE emit: a partial drain sees deferred ≥ rows emitted
      state.update(HostState(base, st.deferred + deferredN))
      Iterator.single(GrantDecision(host, u, granted = false, hostTotal))
    }
    val deferred: Iterator[GrantDecision] = rows.flatMap { case (_, u) =>
      if (k == 0) deferRow(u, base)
      else if (heap.size < k) { heap.add(u); Iterator.empty }
      else {
        // ties defer the incoming url — same multiset of grants as
        // sorted.take(k) (k smallest with multiplicity)
        val out = if (u.compareTo(heap.peek) < 0) {
          val ev = heap.poll(); heap.add(u); ev
        } else u
        deferRow(out, base + k)
      }
    }
    val granted: Iterator[GrantDecision] = new Iterator[GrantDecision] {
      private var inner: Iterator[GrantDecision] = null
      private def it: Iterator[GrantDecision] = {
        if (inner == null) {
          // drain the max-heap (descending) into ascending order
          val g = new Array[String](heap.size)
          var i = g.length - 1
          while (i >= 0) { g(i) = heap.poll(); i -= 1 }
          state.update(HostState(base + g.length, st.deferred + deferredN))
          inner = g.iterator.zipWithIndex.map { case (u, j) =>
            GrantDecision(host, u, granted = true, base + j + 1)
          }
        }
        inner
      }
      def hasNext: Boolean = it.hasNext
      def next(): GrantDecision = it.next()
    }
    deferred ++ granted
  }

  /** Drain a seed-list directory as a stream of micro-batches: each
    * arriving file set is canonicalized, robots-gated, deduped against the
    * persistent seen snapshot, ranked within the micro-batch (budget per
    * host), fetched, and committed. Trigger.AvailableNow = drain-the-
    * frontier mode (reference: the monthly-release batch cadence,
    * csinsights/client/dblpclient.py:485-486). */
  def runCrawlStream(
      spark: SparkSession,
      seedsPath: String,
      seedsSchema: StructType,
      store: DataFrame,
      tableRoot: String,
      checkpoint: String,
      budget: Int = 2,
      numPartitions: Int = 8,
      // maintained cuckoo filter: the per-batch gate probes O(batch) keys
      // against the maintained shards instead of anti-joining the whole
      // accumulated seen table (O(corpus) scan per micro-batch at the
      // 10^10 regime). Exactness is preserved twice over: positives are
      // still exact-confirmed, and the store self-heals from the seen
      // table's first_batch_id lineage after any crash (ShardStore).
      // Gate shape auto-selects on total shard bytes: collect+broadcast
      // below shardBroadcastLimit, co-partitioned probe past it (a
      // 10^10-url filter is ~25 GB — not collectable).
      maintainedShards: Option[graft.seen.ShardStore] = None,
      shardBroadcastLimit: Long = 64L << 20): Unit = {
    import graft.canon.UrlCanon
    val fetchedT = new SnapshotTable(s"$tableRoot/fetched")
    val seenT = new SnapshotTable(s"$tableRoot/seen")

    val stream = spark.readStream.schema(seedsSchema).parquet(seedsPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batchDf: DataFrame, batchId: Long) =>
        // Skip only when BOTH commits landed: a crash between
        // fetchedT.commit and seenT.commit must heal on replay (recompute
        // is deterministic; each commit is idempotent per batchId).
        val fetchedDone = fetchedT.committedBatchIds.contains(batchId)
        val seenDone = seenT.committedBatchIds.contains(batchId)
        if (fetchedDone && seenDone) () // idempotent replay
        else {
          val canon = batchDf.select(
            UrlCanon.canonicalUrl(col("url")).as("canonical_url"),
            UrlCanon.hostOf(col("url")).as("host"),
            col("priority"), col("seed_rank"), lit(0).as("depth"))
          val robots = Scheduler.robotsFilter(canon, graft.model.Synth.robotsRules(spark).toDF())
          val deduped = Scheduler.dedupFrontier(robots)
          // Per-batch caches are registered here and RELEASED in the
          // finally — without that a long stream accumulates one cached
          // frontier (plus its pinned shard-map broadcast) per micro-batch
          // until the session dies. The frontier itself is pinned lazily,
          // only on the paths that consume it more than once (the
          // partitioned gate persists its own post-probe stream instead,
          // so caching the raw frontier there would be a dead write).
          val toRelease = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Dataset[_]]()
          def pinnedFrontier = {
            val p = deduped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            toRelease += p
            p
          }
          try {
          // The maintained-filter path is exact ONLY against a fully keyed
          // commit chain: an unkeyed (batchId=-1) commit is invisible to
          // readSinceBatch's lineage pruning, so its urls would never enter
          // the filter and would pass the gate as "definitely unseen".
          // (Also guards the .max on an empty keyed-id set — a seen table
          // holding only unkeyed commits.) Fall back to the exact anti
          // join, which reads the full table and misses nothing.
          val keyedIds = seenT.committedBatchIds
          // walked ONCE per batch: this batch's own commit below is always
          // keyed, so the post-commit advance reuses the same boolean (an
          // external unkeyed commit racing in mid-batch is equally
          // invisible to a re-check milliseconds later)
          val noUnkeyed = !seenT.hasUnkeyedCommits
          val chainKeyed = keyedIds.nonEmpty && noUnkeyed
          val unseen = seenT.read(spark) match {
            case Some(seen) => maintainedShards match {
              case Some(store) if chainKeyed =>
                val upTo = keyedIds.max
                // heal input is LINEAGE-PRUNED: only commits newer than the
                // store's last good version are read (manifest walk, not a
                // full seen-table scan — the delta is O(missed batches))
                val delta = seenT
                  .readSinceBatch(spark, store.latestBatch.getOrElse(-1L))
                  .getOrElse(seen.limit(0))
                val shards = store.heal(spark, delta, upTo)
                  .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
                toRelease += shards
                // numBuckets rows — the sizing agg is trivial
                val shardBytes = shards.toDF()
                  .agg(coalesce(sum(length(col("blob"))), lit(0L))).head().getLong(0)
                if (shardBytes <= shardBroadcastLimit)
                  graft.seen.CuckooSeen.notSeenExactWithPrebuilt(
                    pinnedFrontier, shards, seen.select("canonical_url"),
                    store.numBuckets, store.salt)
                else
                  graft.seen.CuckooSeen.notSeenExactPartitioned(
                    deduped, shards, seen.select("canonical_url"),
                    store.numBuckets, store.salt, register = toRelease += _)
              case _ =>
                graft.seen.ExactSeen.notSeen(pinnedFrontier, seen.select("canonical_url"))
            }
            case None => pinnedFrontier
          }
          val ranked = Scheduler.schedule(unseen, None, budget)
          if (!fetchedDone) {
            val fetched = Fetch.fetchBatch(ranked, store, numPartitions)
            fetchedT.commit(fetched.drop("bytes"), batchId = batchId)
          }
          seenT.commit(ranked.select(col("canonical_url"), lit(batchId).as("first_batch_id")),
            batchId = batchId)
          // advance the maintained filter through this batch; a crash
          // before this line is healed by the next batch's heal() call.
          // Skipped over a chain with unkeyed commits: advancing would mark
          // the store current while its filter permanently misses the
          // unkeyed rows (which no later heal can see) — leave latestBatch
          // behind so the gate keeps taking the exact path above.
          if (noUnkeyed) maintainedShards.foreach { store =>
            val delta = seenT
              .readSinceBatch(spark, store.latestBatch.getOrElse(-1L))
              .getOrElse(ranked.select("canonical_url").limit(0)
                .withColumn("first_batch_id", lit(batchId)))
            store.heal(spark, delta, batchId)
          }
          } finally toRelease.foreach(_.unpersist())
          ()
        }
      }
      .start()
    q.awaitTermination()
  }
}
