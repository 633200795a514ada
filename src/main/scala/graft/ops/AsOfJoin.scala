package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the payload of the right row
  * with the LARGEST right timestamp ≤ the left timestamp under the same
  * key (null payload when no right row precedes it).
  *
  * Shape: union + fill-down window, the merge-as-of form every
  * time-series engine runs (pandas `merge_asof`, Flink temporal join,
  * DuckDB `ASOF JOIN` — the oracle twin). ONE hash shuffle on the key and
  * a per-key sort; NO join operator at all. The naive expression — a
  * per-key inequality join then max-per-left filter — materializes a
  * left×right cross product per key before filtering, which is quadratic
  * on hot keys (a Zipf-hot host in a 10^10-row frontier makes that shape
  * fatal); the merge form's per-key state during the scan is O(1) (last
  * payload seen), so it survives any key skew the sort itself survives.
  *
  * Reference behaviour this generalizes: the crawler consults the newest
  * state snapshot at-or-before each action (cs-insights-crawler
  * main.py:61-74 reloads the latest cached release before each step) —
  * as-of is that "latest version visible at time t" lookup as a bulk
  * operator.
  *
  * Semantics pinned by [[AsOfJoinSpec]] and the `st5_asof_join` oracle:
  *  - inclusive bound: a right row at EXACTLY the left timestamp is
  *    visible (right sorts before left at equal ts);
  *  - among right duplicates at the same (key, ts) the one with the
  *    largest payload struct wins (fill-down keeps the latest preceding
  *    non-null, and the sort is made total on the payload);
  *  - left rows keep ALL their columns; payload columns come back under
  *    their right-side names, null when nothing precedes.
  *
  * `leftTs`/`rightTs` must have the same (orderable) type; callers align
  * with a cast when the sources differ.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val lSide = left.select(
      Seq(col(key).as("__k"), col(leftTs).as("__t"), lit(1).as("__side")) ++
        left.columns.map(c => col(c).as("__l_" + c)): _*)
    val rSide = right.select(
      col(key).as("__k"), col(rightTs).as("__t"), lit(0).as("__side"),
      struct(payloadCols.map(col): _*).as("__p"))
    // allowMissingColumns: the right side carries null left-columns, the
    // left side a null payload — exactly the fill-down sentinel.
    val u = lSide.unionByName(rSide, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      // right (side 0) before left (side 1) at equal ts ⇒ inclusive bound;
      // __p makes the order total among same-instant right rows.
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    filled.select(
      left.columns.map(c => col("__l_" + c).as(c)) ++
        payloadCols.map(p => col("__asof").getField(p).as(p)): _*)
  }
}
