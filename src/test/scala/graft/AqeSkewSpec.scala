package graft

import org.apache.spark.sql.functions._

/** North-rule evidence: "AQE skew-join handling on hot hosts" — a Zipf-hot
  * host that dominates a shuffle join gets its partition SPLIT by AQE's
  * skew-join rule at runtime (no manual salting needed on the join path;
  * the scheduler's salted repartition handles the non-join stages). The
  * thresholds are lowered to make the property observable at test scale —
  * the mechanism is identical at 256MB-partition production scale. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the hot-host partition in a skewed shuffle join") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // hot host carries 50% of 100k frontier rows; per-row payload pads
      // the hot partition well past the lowered skew threshold
      val frontier = spark.range(0, 100000, 1, 8).select(
        when(col("id") % 2 === 0, lit("hot.example.com"))
          .otherwise(concat(lit("h"), (col("id") % 50).cast("string"), lit(".example.com")))
          .as("host"),
        col("id"),
        lpad(col("id").cast("string"), 256, "x").as("payload"))
      val hostMeta = spark.range(0, 51).select(
        when(col("id") === 50, lit("hot.example.com"))
          .otherwise(concat(lit("h"), col("id").cast("string"), lit(".example.com")))
          .as("host"),
        (col("id") % 7 + 1).as("budget"))
      val joined = frontier.join(hostMeta, "host")
      // collect() executes THIS QueryExecution (count() would build a new
      // one and leave this plan unfinalized, isFinalPlan=false)
      assert(joined.collect().length == 100000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") && plan.contains("AQEShuffleRead skewed"),
        s"no AQE skew split in plan:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
