package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the "take k documents per
  * source/language/shard" step every training-data pipeline runs before
  * mixing. Selection order is a cross-engine hash of the id (md5-prefix,
  * the same 60-bit trick the repo's other oracles use), so the sample is
  * stable across runs AND oracle-checkable: DuckDB ranks by the identical
  * hash and must produce the identical rows.
  *
  * Scale shape — why a typed Aggregator and not a window rank: `row_number
  * OVER (PARTITION BY group ORDER BY hash)` sorts each group's FULL row
  * set in one task (a Zipf-hot source at 100 TB = the skew trap the banded
  * scheduler exists for). The bounded top-k Aggregator instead keeps a
  * ≤ k-pair buffer: map-side partial top-k per input partition (combiner
  * before any shuffle), partials merged pairwise — O(k) state per group,
  * one shuffle of ~numGroups × k rows, no full sort anywhere. Row-equal to
  * the window form (OpsSpec) and to the DuckDB window oracle (s1).
  */
object Sampling {

  /** 60-bit cross-engine id hash — [[CrossHash.md5Hash60]] over the id's
    * string form. */
  def idHash(id: Column): Column = CrossHash.md5Hash60(id.cast("string"))

  /** Bounded top-k by ascending (hash, id): buffer is a packed
    * `[h0,id0,h1,id1,...]` array kept sorted, never more than k pairs. */
  final class TopKByHash(k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] =
      insert(buf, in._1, in._2)

    private def insert(buf: Array[Long], h: Long, id: Long): Array[Long] = {
      val n = buf.length / 2
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        val mh = buf(2 * mid)
        val mi = buf(2 * mid + 1)
        if (mh < h || (mh == h && mi < id)) lo = mid + 1 else hi = mid
      }
      if (n == k && lo == n) return buf // worse than every kept pair
      val keep = math.min(n + 1, k)
      val out = new Array[Long](keep * 2)
      System.arraycopy(buf, 0, out, 0, lo * 2)
      out(2 * lo) = h
      out(2 * lo + 1) = id
      val tailPairs = keep - lo - 1
      if (tailPairs > 0) System.arraycopy(buf, 2 * lo, out, 2 * (lo + 1), tailPairs * 2)
      out
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val keep = math.min((a.length + b.length) / 2, k)
      val out = new Array[Long](keep * 2)
      var ia = 0
      var ib = 0
      var io = 0
      while (io < keep) {
        val takeA = ib * 2 >= b.length || (ia * 2 < a.length &&
          (a(2 * ia) < b(2 * ib) ||
            (a(2 * ia) == b(2 * ib) && a(2 * ia + 1) <= b(2 * ib + 1))))
        if (takeA) { out(2 * io) = a(2 * ia); out(2 * io + 1) = a(2 * ia + 1); ia += 1 }
        else { out(2 * io) = b(2 * ib); out(2 * io + 1) = b(2 * ib + 1); ib += 1 }
        io += 1
      }
      out
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Bounded weighted top-k with a STRING payload: keeps the k
    * (weight, payload) pairs ranked by weight DESC then payload ASC —
    * the anchor-text/top-URL aggregation shape (a1). Same scale argument
    * as [[TopKByHash]]: O(k) state per group, map-side partials, no
    * per-group sort — a hub page with 10^8 distinct anchors costs the
    * reduce side k rows, not a window sort. */
  final class TopKWeighted(k: Int)
      extends Aggregator[(Long, String), Seq[(Long, String)], Seq[(Long, String)]] {

    private def precedes(a: (Long, String), b: (Long, String)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    override def zero: Seq[(Long, String)] = Vector.empty

    override def reduce(buf: Seq[(Long, String)], in: (Long, String)): Seq[(Long, String)] = {
      val at = buf.indexWhere(!precedes(_, in))
      if (at < 0) { if (buf.length < k) buf :+ in else buf }
      else ((buf.take(at) :+ in) ++ buf.drop(at)).take(k)
    }

    override def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] = {
      val out = Vector.newBuilder[(Long, String)]
      var ia = 0
      var ib = 0
      var n = 0
      val lim = math.min(a.length + b.length, k)
      while (n < lim) {
        val takeA = ib >= b.length || (ia < a.length && !precedes(b(ib), a(ia)))
        if (takeA) { out += a(ia); ia += 1 } else { out += b(ib); ib += 1 }
        n += 1
      }
      out.result()
    }

    override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

    override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
  }

  /** k payload strings per group by weight DESC, payload ASC. Output:
    * (groupCol STRING, payloadCol STRING, weightCol LONG, rk LONG). */
  def topKWeighted(df: DataFrame, groupCol: String, payloadCol: String,
      weightCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKWeighted(k).toColumn
    df.select(col(groupCol).cast("string").as("g"),
        col(weightCol).cast("long").as("w"), col(payloadCol).cast("string").as("p"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg)
      .flatMap { case (g, items) =>
        items.iterator.zipWithIndex.map { case ((w, p), i) => (g, p, w, (i + 1).toLong) }
      }
      .toDF(groupCol, payloadCol, weightCol, "rk")
  }

  /** Temperature-flattened corpus mixing (the multilingual-LM sampling
    * step: mC4/XLM-R style, α = 0.5): each group's quota is
    * `min(n_g, (kTotal * w_g) DIV Σw)` with the integer weight
    * `w_g = floor(sqrt(n_g))` — a dominant language's share of the mix
    * shrinks toward the flattened α-power distribution while tail
    * languages are never upsampled past their own size. Every term is
    * integer or a correctly-rounded IEEE sqrt of an integer, so the
    * quota math is bit-reproducible in the DuckDB oracle (no
    * float-summation-order hazard).
    *
    * Selection inside a group is the same bounded top-k-by-hash as
    * [[stratifiedSample]] — kTotal bounds every quota by construction,
    * so one aggregator pass with k = kTotal, then a broadcast join
    * against the (tiny, one row per group) quota table trims each group
    * to its own quota. O(kTotal) state per group, map-side partials, no
    * per-group window sort, no driver round-trip. Output:
    * (groupCol STRING, idCol LONG, rk LONG, quota LONG). */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      kTotal: Int): DataFrame = {
    val counts = df.groupBy(col(groupCol).cast("string").as(groupCol))
      .agg(count(lit(1)).as("n_g"))
    val w = counts.withColumn("w", floor(sqrt(col("n_g"))).cast("long"))
    val sumw = w.agg(sum(col("w")).cast("long").as("sw"))
    val quotas = w.crossJoin(broadcast(sumw))
      .withColumn("quota", least(col("n_g"), expr(s"($kTotal * w) DIV sw")))
      .select(col(groupCol), col("quota"))
    stratifiedSample(df, groupCol, idCol, kTotal)
      .join(broadcast(quotas), Seq(groupCol))
      .filter(col("rk") <= col("quota"))
      .select(col(groupCol), col(idCol), col("rk"), col("quota"))
  }

  /** k rows per group, ranked by the cross-engine id hash. Output columns:
    * (groupCol STRING, idCol LONG, rk LONG with rk in 1..k). */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new TopKByHash(k).toColumn
    df.select(col(groupCol).cast("string").as("g"),
        idHash(col(idCol)).as("h"), col(idCol).cast("long").as("id"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(agg)
      .flatMap { case (g, packed) =>
        Iterator.range(0, packed.length / 2).map(i => (g, packed(2 * i + 1), (i + 1).toLong))
      }
      .toDF(groupCol, idCol, "rk")
  }
}
