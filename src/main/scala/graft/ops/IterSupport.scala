package graft.ops

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Iteration support shared by the engine's round-based graph operators
  * ([[Dedup.connectedComponents]]'s star rounds, [[LinkGraph]]'s pointer
  * doubling and PageRank): ONE definition of the shuffle-width rule and
  * the lineage-truncation policy, so a tuning change cannot silently
  * diverge the CC and link-graph loops (they are documented as sharing
  * one dispatch rule). */
private[graft] object IterSupport {

  /** Size an RDD iteration's shared partitioner from the MEASURED edge
    * count (~50k edges/partition — small enough that compute, not
    * scheduling, fills each task), not the input's partitioning: AQE
    * coalesces a small distinct() to one partition and cannot re-plan
    * across RDD rounds, and a toy edge set across the session's full
    * shuffle width would pay stages × width empty-task scheduling per
    * round. Conf: `graft.cc.edgesPerPartition`. */
  def sharedPartitioner(spark: SparkSession, edgeCount: Long,
      inputParts: Int): HashPartitioner = {
    val edgesPerPartition = spark.conf.getOption("graft.cc.edgesPerPartition")
      .map(_.toLong).getOrElse(50000L)
    val ceiling = math.max(inputParts, spark.sparkContext.defaultParallelism)
    new HashPartitioner(
      math.max(1, math.min(ceiling, (edgeCount / edgesPerPartition + 1).toInt)))
  }

  /** Truncate an RDD round's lineage: reliable `checkpoint` when the
    * session has a checkpoint dir (cluster posture — survives executor
    * loss), else `localCheckpoint`. Persist first on the reliable path: a
    * reliable checkpoint otherwise recomputes the round in a second job
    * when it writes the checkpoint files. Materializes in the caller's
    * next action. */
  def truncateRdd[T](rdd: RDD[T], reliable: Boolean): RDD[T] = {
    if (reliable) {
      rdd.persist(StorageLevel.MEMORY_AND_DISK)
      rdd.checkpoint()
    } else rdd.localCheckpoint()
    rdd
  }

  /** The DataFrame twin of [[truncateRdd]] (non-eager: execution rides
    * the caller's next action — note plan COMPILATION still happens at
    * call time, which is exactly why small loops run on RDDs). Persist
    * first on the reliable path for the same reason truncateRdd does: a
    * reliable checkpoint otherwise recomputes the lineage a second time
    * when it writes the checkpoint files, and with the default
    * checkpointAllMarkedAncestors=false an INTERMEDIATE marked level that
    * the outermost checkpoint shadows would stay unmaterialized entirely —
    * every later read of a stored PageRank level would then re-run its
    * lineage back to the raw edges (localCheckpoint persists on its own). */
  def truncateDf(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) {
      df.persist(StorageLevel.MEMORY_AND_DISK)
      df.checkpoint(eager = false)
    } else df.localCheckpoint(eager = false)
}
