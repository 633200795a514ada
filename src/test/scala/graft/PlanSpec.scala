package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan shape assertions — the 100TB-readiness gates:
  * broadcasts where intended, filters pushed to the parquet scan, no
  * gratuitous shuffles (a wrong plan at sf0.01 is a catastrophic plan at
  * 100 TB). */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // materialize so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def planString(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // Under AQE, materialized exchanges appear as (leaf) ShuffleQueryStage
  // nodes in the final plan; plain exchanges appear pre-AQE. Count both.
  private def countShuffles(p: SparkPlan): Int = {
    val s = p.toString
    "ShuffleQueryStage".r.findAllIn(s).size.max(
      p.collect { case e: ShuffleExchangeLike => e }.size)
  }

  test("q3_star_join broadcasts both dimension tables (no shuffle join on facts)") {
    val plan = planString(SparkEntry.queries("q3_star_join")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "star dims must not sort-merge")
  }

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val df = SparkEntry.queries("q1_agg")(spark, dir)
    val plan = planString(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed to parquet:\n${plan.take(2000)}")
    // ReadSchema must not include unused columns like l_orderkey/l_partkey
    val readSchema = "ReadSchema: [^\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"column pruning failed: $readSchema")
  }

  test("q1_agg does exactly one shuffle (partial agg map-side, final after exchange)") {
    val p = executedPlan(SparkEntry.queries("q1_agg")(spark, dir))
    assert(countShuffles(p) == 1, s"expected 1 shuffle:\n$p")
    assert(p.toString.contains("HashAggregate"), "hash aggregation expected")
  }

  test("c1_canonicalize is shuffle-free (pure projection pipeline)") {
    val p = executedPlan(SparkEntry.queries("c1_canonicalize")(spark, dir))
    assert(countShuffles(p) == 0, s"projection must not shuffle:\n$p")
  }

  test("custom expressions stay inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val docs = graft.model.Synth.imageDocs(spark, 100, 2).toDF()
    val df = graft.extract.Extract.metadata(docs)
      .select(sum(bit_count(col("dec_phash"))), sum(col("dec_w").cast("long")))
    val plan = planString(df)
    // AQE's final-plan rendering marks codegen stages with "*(n)"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*(1) Project"),
      s"no codegen span:\n$plan")
    assert("\\*\\(\\d+\\) Project \\[decode_width".r.findFirstIn(plan).isDefined,
      s"custom expressions fell out of the codegen stage:\n$plan")
  }

  test("politeness schedule (banded): frontier shuffles once; offsets join broadcasts") {
    val df = SparkEntry.queries("c5_politeness_rank")(spark, dir)
    val p = executedPlan(df)
    val s = p.toString
    // Banded plan shape: ONE exchange carries the frontier — keyed by
    // (host, priority), so the Zipf-hot host spreads over #bands tasks —
    // and the per-(host,band) offsets (hosts×bands rows, tiny) come back
    // via a BROADCAST join. The offsets derivation rides a reused copy of
    // the same banded exchange plus its own tiny hosts×bands shuffle;
    // nothing frontier-sized shuffles twice.
    assert(countShuffles(p) <= 3, s"too many exchanges:\n$p")
    assert(s.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$s")
    assert(!s.contains("SortMergeJoin"), s"offsets join must not sort-merge:\n$s")
  }

  test("robots gate: kernel verdict runs inside the codegen span over a broadcast join") {
    val df = SparkEntry.queries("c25_robots_gate")(spark, dir)
    val p = executedPlan(df)
    val s = p.toString
    // the rules dim broadcasts (never shuffles the frontier) ...
    assert(s.contains("BroadcastHashJoin"), s"rules dim must broadcast:\n$s")
    // ... and the verdict filter is codegen'd ("*(n) Filter" above the
    // join), not a CodegenFallback project — the HOF form this replaced
    // planned the verdict as an interpreted expression
    assert("\\*\\(\\d+\\) Filter".r.findFirstIn(s).isDefined,
      s"robots verdict fell out of codegen:\n$s")
    assert(!s.contains("CodegenFallback"), s"interpreted expression in plan:\n$s")
  }

  test("seen anti-join under AQE avoids sort-merge on the small side") {
    val plan = planString(SparkEntry.queries("c3_seen_antijoin")(spark, dir))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("ShuffledHashJoin"),
      s"anti join picked a bad strategy:\n$plan")
  }

  test("partitioned gate cogroups candidates with shards — no join, no blob in the candidate stream") {
    // the gate must NOT plan a join that materializes the shard blob onto
    // every candidate row: the probe's getBinary would then copy ~0.5 MB
    // out of each joined row (measured 12-17s vs 0.9s broadcast at 1M
    // candidates × 32 shards, in both the broadcast-hash and forced-SMJ
    // shapes). The cogroup shape deserializes one shard per bucket task
    // and streams candidates through it; nothing for AQE to flip.
    import org.apache.spark.sql.functions.col
    import graft.canon.UrlCanon
    val cand = graft.queries.Fixture.frontier(spark, dir)
      .select(UrlCanon.canonicalUrl(col("url")).as("canonical_url")).distinct()
    val seen = graft.queries.Fixture.seenSet(spark, dir)
    val shards = graft.seen.CuckooSeen.buildShards(seen, 8)
    val plan = planString(graft.seen.CuckooSeen.gateNotSeenPartitioned(cand, shards, 8))
    assert(plan.contains("CoGroup"), s"probe must be a cogroup:\n$plan")
    assert(!plan.contains("Join"), s"no join may carry the blob into the candidate stream:\n$plan")
  }

  test("span scrub: no window, no cartesian; dup set is a partial-distinct hash agg") {
    // the scale contract for d17: the duplicated-gram set must plan as a
    // two-phase hash aggregate (map-side partial before the exchange) and
    // nothing in the pipeline may fall back to a window sort or an
    // all-pairs join — at 100 TB the gram stream is corpus-sized
    val df = SparkEntry.queries("d17_span_scrub")(spark, dir)
    val plan = planString(df)
    assert(!plan.contains("Window"), s"span scrub must not plan a window:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"span scrub must not plan an all-pairs join:\n$plan")
    assert(plan.contains("HashAggregate"), s"dup set must hash-aggregate:\n$plan")
  }

  test("model scoring broadcasts the weight table; score agg is map-side partial") {
    // the corpus-sized token stream must NEVER shuffle to meet the
    // MB-sized model: a shuffled join here moves the whole corpus once
    // more at 100 TB. Weights broadcast; the only exchange is the
    // per-doc sum's (with partial_sum before it).
    val df = SparkEntry.queries("t8_model_score")(spark, dir)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), s"weights must broadcast:\n$plan")
    assert(countShuffles(executedPlan(df)) <= 1, s"token stream shuffled more than the agg:\n$plan")
  }
}
