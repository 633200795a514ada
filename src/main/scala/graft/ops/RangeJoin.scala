package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-range inner join via bin replication — the scale form of
  * `points JOIN ranges ON v BETWEEN lo AND hi`.
  *
  * A bare inequality join has no equi key, so Catalyst can only plan a
  * nested-loop shape (BroadcastNestedLoopJoin when one side fits,
  * CartesianProduct otherwise) — O(|points|·|ranges|) comparisons no
  * matter how it is distributed. Binning restores an equi key: every
  * range row is exploded to the fixed-width bins it overlaps, every point
  * owns exactly one bin, and a plain hash join on the bin plus the true
  * BETWEEN residual filter gives the same rows with
  * O(|points| + |ranges|·(width/binWidth + 1)) work and ONE ordinary
  * shuffle (or a broadcast when the exploded range side is small —
  * Catalyst decides on stats; either way never a nested loop).
  * [[graft.queries.PlanSpec]] locks the no-nested-loop shape.
  *
  * Pick `binWidth` near the typical range width: replication per range is
  * `width/binWidth + 1`, while a too-small bin multiplies the range side
  * and a too-large bin turns the residual filter into the real join.
  * Domains are assumed non-negative (hashes, timestamps, byte offsets) —
  * `DIV` truncates toward zero, so negative values would mis-bin.
  */
object RangeJoin {

  def binned(
      points: DataFrame,
      pointCol: String,
      ranges: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val rb = ranges.withColumn(
      "__bin", explode(sequence(expr(s"$loCol DIV $binWidth"), expr(s"$hiCol DIV $binWidth"))))
    val pb = points.withColumn("__bin", expr(s"$pointCol DIV $binWidth"))
    pb.join(rb, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
