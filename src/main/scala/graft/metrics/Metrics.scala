package graft.metrics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Progress/metrics sink — the Spark-native form of the reference's tqdm
  * progress cadence (csinsights/data/s2processor.py:155 wraps every record
  * loop in tqdm; csinsights/client/dblpclient.py:72-88 ticks per downloaded
  * chunk). A driver-side loop cannot tick per row in a distributed job, so
  * progress is observed where Spark actually knows it:
  *
  *  - [[ProgressListener]]: task/stage-granular counters (records in/out,
  *    bytes, shuffle volume) via SparkListener, with a log line every
  *    `logEveryTasks` completions — the tqdm bar, at task cadence;
  *  - [[logStreamProgress]]: per-micro-batch rows/sec via
  *    StreamingQueryListener — the tqdm postfix, at batch cadence;
  *  - per-commit lineage rows live in SnapshotTable manifests (each commit
  *    records its row count captured by `observe` on the write action).
  *
  * Everything is passive instrumentation: no extra jobs, no collect, no
  * effect on plans.
  */
object Metrics {

  final case class Snapshot(
      tasks: Long, stages: Long,
      recordsRead: Long, bytesRead: Long,
      recordsWritten: Long,
      shuffleRecordsRead: Long, shuffleBytesWritten: Long)

  /** Register a progress listener on the session. Returns the listener;
    * callers read [[ProgressListener.snapshot]] at any time and MUST
    * eventually [[ProgressListener.unregister]]. */
  def register(spark: SparkSession, logEveryTasks: Int = 1000,
      sink: String => Unit = s => println(s"[graft-metrics] $s")): ProgressListener = {
    val l = new ProgressListener(spark, logEveryTasks, sink)
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Attach a per-micro-batch progress log (rows/sec, like the reference's
    * tqdm rate) to the session's streams. Returns the listener for
    * removal. `sink` defaults to log4j INFO; tests inject a buffer. */
  def logStreamProgress(spark: SparkSession,
      sink: String => Unit = null): StreamingQueryListener = {
    val out = Option(sink).getOrElse((s: String) => println(s"[graft-metrics] $s"))
    val l = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        out(s"stream ${e.id} started")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        out(f"stream ${p.id} batch ${p.batchId}: ${p.numInputRows} rows " +
          f"@ ${p.processedRowsPerSecond}%.0f rows/s")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        out(s"stream ${e.id} terminated")
    }
    spark.streams.addListener(l)
    l
  }
}

/** Task/stage-granular progress counters. Thread-safe (listener bus calls
  * from the event thread, snapshot() from anywhere). */
final class ProgressListener(spark: SparkSession, logEveryTasks: Int,
    sink: String => Unit = s => ()) extends SparkListener {
  private val tasks = new AtomicLong
  private val stages = new AtomicLong
  private val recordsRead = new AtomicLong
  private val bytesRead = new AtomicLong
  private val recordsWritten = new AtomicLong
  private val shuffleRecordsRead = new AtomicLong
  private val shuffleBytesWritten = new AtomicLong

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      recordsRead.addAndGet(m.inputMetrics.recordsRead)
      bytesRead.addAndGet(m.inputMetrics.bytesRead)
      recordsWritten.addAndGet(m.outputMetrics.recordsWritten)
      shuffleRecordsRead.addAndGet(m.shuffleReadMetrics.recordsRead)
      shuffleBytesWritten.addAndGet(m.shuffleWriteMetrics.bytesWritten)
    }
    val t = tasks.incrementAndGet()
    if (logEveryTasks > 0 && t % logEveryTasks == 0)
      sink(s"progress: $t tasks, ${recordsRead.get} records read, " +
        s"${shuffleRecordsRead.get} shuffled")
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    ()
  }

  def snapshot: Metrics.Snapshot = Metrics.Snapshot(
    tasks.get, stages.get, recordsRead.get, bytesRead.get,
    recordsWritten.get, shuffleRecordsRead.get, shuffleBytesWritten.get)

  def unregister(): Unit = spark.sparkContext.removeSparkListener(this)
}
