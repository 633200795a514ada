package graft

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, RangeJoin}

/** Semantic tests for the two non-equi join operators: as-of (backward,
  * inclusive) and binned range join. Both are cross-checked against a
  * brute-force in-memory reference over randomized inputs — the DuckDB
  * oracle (st5/c29) pins cross-engine agreement, this pins the SEMANTICS
  * against an implementation that shares no code with the operator. */
class AsOfRangeSpec extends SparkSpec {

  private def mix(i: Long): Long = graft.imagecodec.ImageCodec.mix64(i) & Long.MaxValue

  test("as-of backward matches brute-force max-preceding on a randomized input") {
    import spark.implicits._
    // 8 keys, irregular timestamps, some keys view-less, some click-less
    val rights = (0 until 300).map { i =>
      (mix(i) % 8, mix(i * 7 + 1) % 1000, 10000L + i) // (key, ts, payload id)
    }.filter(_._1 != 3) // key 3 has NO right rows at all
    val lefts = (0 until 300).map { i =>
      (mix(i * 13 + 5) % 8, mix(i * 29 + 11) % 1000, 20000L + i)
    }
    val r = rights.toDF("k", "t", "rid")
    val l = lefts.toDF("k", "t", "lid").withColumnRenamed("t", "lt")
    val got = AsOfJoin.backward(l, r.withColumnRenamed("t", "rt"),
        "k", "lt", "rt", Seq("rid", "rt"))
      .select("lid", "rid").collect()
      .map(row => row.getLong(0) -> (if (row.isNullAt(1)) None else Some(row.getLong(1))))
      .toMap
    val expected = lefts.map { case (k, lt, lid) =>
      val preceding = rights.filter(x => x._1 == k && x._2 <= lt)
      // ties on ts: the largest payload struct wins (rt equal → larger rid)
      val best = preceding.sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      lid -> best
    }.toMap
    assert(got.size == lefts.size, s"row count ${got.size} != ${lefts.size}")
    val diffs = expected.collect { case (lid, e) if got(lid) != e => (lid, e, got(lid)) }
    assert(diffs.isEmpty, s"mismatches: ${diffs.take(5)}")
  }

  test("as-of inclusive bound: a right row at exactly the left ts is visible") {
    import spark.implicits._
    val l = Seq((1L, 100L, 1L)).toDF("k", "lt", "lid")
    val r = Seq((1L, 100L, 7L), (1L, 99L, 6L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.backward(l, r, "k", "lt", "rt", Seq("rid")).collect()
    assert(out.head.getAs[Long]("rid") == 7L)
  }

  test("as-of with no preceding right row yields null payload, row kept") {
    import spark.implicits._
    val l = Seq((1L, 50L, 1L), (2L, 50L, 2L)).toDF("k", "lt", "lid")
    val r = Seq((1L, 99L, 6L)).toDF("k", "rt", "rid")
    val out = AsOfJoin.backward(l, r, "k", "lt", "rt", Seq("rid"))
      .orderBy("lid").collect()
    assert(out.length == 2 && out.forall(_.isNullAt(out.head.fieldIndex("rid"))))
  }

  test("binned range join equals brute-force BETWEEN on randomized ranges, any binWidth") {
    import spark.implicits._
    // overlapping ranges on purpose — a point may land in SEVERAL
    val ranges = (0 until 120).map { i =>
      val lo = mix(i * 3 + 2) % 5000
      (i.toLong, lo, lo + mix(i * 5 + 4) % 400)
    }
    val points = (0 until 400).map(i => (i.toLong, mix(i * 11 + 9) % 6000))
    val rdf = ranges.toDF("range_id", "lo", "hi")
    val pdf = points.toDF("pid", "v")
    val expected = (for {
      (pid, v) <- points; (rid, lo, hi) <- ranges if v >= lo && v <= hi
    } yield (pid, rid)).toSet
    for (binW <- Seq(1L, 64L, 500L, 10000L)) {
      val got = RangeJoin.binned(pdf, "v", rdf, "lo", "hi", binW)
        .select("pid", "range_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"binWidth=$binW: ${got.size} vs ${expected.size} pairs")
    }
  }

  test("binned range join plans a hash or broadcast-hash join, never a nested loop") {
    import spark.implicits._
    val rdf = (0 until 50).map(i => (i.toLong, i * 100L, i * 100L + 80L)).toDF("range_id", "lo", "hi")
    val pdf = spark.range(0, 2000).select(col("id").as("pid"), (col("id") * 7 % 5000).as("v"))
    val plan = RangeJoin.binned(pdf, "v", rdf, "lo", "hi", 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop shape leaked into:\n$plan")
  }

  test("as-of plans one window over the union — no join operator at all") {
    import spark.implicits._
    val l = spark.range(0, 1000).select((col("id") % 16).as("k"), col("id").as("lt"), col("id").as("lid"))
    val r = spark.range(0, 1000).select((col("id") % 16).as("k"), (col("id") * 3 % 997).as("rt"), col("id").as("rid"))
    val plan = AsOfJoin.backward(l, r, "k", "lt", "rt", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected the fill-down window in:\n$plan")
  }
}
