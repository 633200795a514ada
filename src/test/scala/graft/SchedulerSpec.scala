package graft

import org.apache.spark.sql.functions._

import graft.sched.Scheduler

/** Direct unit tests for the scheduler gates (robots precedence and the
  * no-row-inflation invariant; the full pipeline behavior is covered by
  * CrawlOrderSpec vs ReferenceSim). */
class SchedulerSpec extends SparkSpec {

  private def frontier = {
    import spark.implicits._
    Seq(
      ("https://multi.example.com/img/a", "multi.example.com", 0L, 0L, 0),
      ("https://multi.example.com/img/public/b", "multi.example.com", 0L, 1L, 0),
      ("https://multi.example.com/txt/c", "multi.example.com", 0L, 2L, 0),
      ("https://norules.example.com/x", "norules.example.com", 0L, 3L, 0)
    ).toDF("canonical_url", "host", "priority", "seed_rank", "depth")
  }

  test("robotsFilter: a host with MANY rules never duplicates frontier rows") {
    import spark.implicits._
    val robots = Seq(
      ("multi.example.com", "/img/", false),
      ("multi.example.com", "/video/", false),
      ("multi.example.com", "/audio/", false)
    ).toDF("host", "path_prefix", "allowed")
    val out = Scheduler.robotsFilter(frontier, robots)
    val urls = out.select("canonical_url").collect().map(_.getString(0)).toSeq
    assert(urls.size == urls.distinct.size, s"duplicated rows: $urls")
    assert(urls.toSet == Set(
      "https://multi.example.com/txt/c", "https://norules.example.com/x"))
  }

  test("robotsFilter: longest matching prefix wins (allow overrides broader disallow)") {
    import spark.implicits._
    val robots = Seq(
      ("multi.example.com", "/img/", false),
      ("multi.example.com", "/img/public/", true)
    ).toDF("host", "path_prefix", "allowed")
    val urls = Scheduler.robotsFilter(frontier, robots)
      .select("canonical_url").collect().map(_.getString(0)).toSet
    assert(urls == Set(
      "https://multi.example.com/img/public/b", // re-allowed by deeper rule
      "https://multi.example.com/txt/c",
      "https://norules.example.com/x"))
  }

  test("globalRank is bit-identical to the single-partition window rank") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // nulls + heavy ties in the leading key; id makes the key total
    val df = (0 until 5000).map { i =>
      (i.toLong, if (i % 10 == 0) null else s"g${i % 7}", i % 3)
    }.toDF("id", "grp", "band").repartition(8)
    val keys = Seq(col("grp").isNotNull, col("grp"), col("band"), col("id"))
    val single = df.withColumn("rk", row_number().over(Window.orderBy(keys: _*)))
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dist = Scheduler.globalRank(df, keys, "rk", parts = 8)
      .select("id", "rk").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(dist == single)
    // and the plan is actually distributed: range partitioning present
    val plan = Scheduler.globalRank(df, keys, "rk", parts = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"expected range exchange in:\n$plan")
  }

  test("robotsFilter: empty prefix means no restriction; unlisted hosts pass") {
    import spark.implicits._
    val robots = Seq(("multi.example.com", "", true))
      .toDF("host", "path_prefix", "allowed")
    assert(Scheduler.robotsFilter(frontier, robots).count() == 4)
  }
}
