package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDX-style capture-index assembly — the step that turns a batch of
  * fetched records into the (shard, sorted key, byte offset) triples a
  * web-archive index needs so a later reader can seek straight to one
  * record inside a multi-GB shard file without scanning it.
  *
  * Scale shape: ONE shuffle, on the shard key, then an in-partition sort.
  * The per-shard running total is a window sum over that sort — which is
  * not a scalability trap here the way a per-group window rank is for a
  * Zipf-hot host, because the shard key is a uniform assignment the
  * WRITER controls (it sizes shards; nothing external can make one shard
  * hot), and the records of a shard must be materialized sorted in that
  * task anyway to be written out in key order. The offset column falls
  * out of the same pass for free.
  */
object CrawlIndex {

  /** Per-shard byte offsets: records of each `shardCol` group are sorted
    * by `sortCols` (the on-disk record order) and `byte_offset` is the sum
    * of `lenCol` over the records strictly before each row — i.e. the seek
    * position of the record inside its shard file. `sortCols` must be a
    * unique key within a shard or the offsets are order-ambiguous. */
  def cdxOffsets(df: DataFrame, shardCol: String, lenCol: String,
      sortCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(sortCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("byte_offset", coalesce(sum(col(lenCol)).over(w), lit(0L)))
  }
}
