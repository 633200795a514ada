package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.metrics.Metrics

/** The progress/metrics sink actually observes work: batch listener counts
  * tasks/records and emits cadenced lines; the streaming listener reports
  * per-micro-batch rows. */
class MetricsSpec extends SparkSpec {

  /** Listener delivery is async; poll until the condition holds. */
  private def eventually(timeoutMs: Long = 10000)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("ProgressListener counts tasks/records and ticks at the configured cadence") {
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = Metrics.register(spark, logEveryTasks = 2, sink = s => { lines.add(s); () })
    try {
      spark.range(0, 100000, 1, 8)
        .select(sum(col("id"))).collect()
      assert(eventually()(l.snapshot.tasks >= 8), s"tasks=${l.snapshot.tasks}")
      val snap = l.snapshot
      assert(snap.stages >= 1)
      assert(!lines.isEmpty, "no progress lines emitted")
      assert(lines.peek().startsWith("progress:"))
    } finally l.unregister()
  }

  test("streaming listener reports per-micro-batch input rows") {
    import spark.implicits._
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val l = Metrics.logStreamProgress(spark, s => { seen.add(s); () })
    try {
      val dir = Files.createTempDirectory("msrc").toString
      val ckpt = Files.createTempDirectory("mckpt").toString
      val out = Files.createTempDirectory("mout").toString
      (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(dir)
      val q = spark.readStream.schema("id LONG, v STRING").parquet(dir)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // listener events are async; poll for arrival
      assert(eventually()(seen.toArray.exists(_.toString.contains("batch"))),
        seen.toArray.mkString("\n"))
      val all = seen.toArray.map(_.toString)
      assert(all.exists(_.contains("started")), all.mkString("\n"))
      assert(all.exists(s => s.contains("batch") && s.contains("100 rows")),
        all.mkString("\n"))
    } finally spark.streams.removeListener(l)
  }
}
