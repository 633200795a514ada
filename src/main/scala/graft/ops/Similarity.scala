package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Dot products via `zip_with` + `aggregate` — built-in
  * higher-order functions, codegen'd, no UDF.
  */
object Similarity {

  /** elementwise dot product of two array columns, in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for each query vector — the exact
    * baseline. Queries should be small (broadcast side); the big side
    * streams through one codegen'd stage, then a window-rank per query.
    * Scale: cost = |queries| × |corpus| dot products, distributed over the
    * corpus partitioning; for 100 TB use [[annTopK]] instead. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). No RNG state, reproducible anywhere. */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(i, lit(p), lit(0x9e37L)), lit(2000000L)).cast("double") / 1000000.0) - 1.0

  /** Random-hyperplane sign signature packed into a long: bit p = sign of
    * <v, plane_p>. Buckets vectors so near-identical directions collide. */
  def hyperplaneSignature(vec: Column, planes: Int): Column = {
    val idx = sequence(lit(0), size(vec) - 1)
    val bits = (0 until planes).map { p =>
      val d = aggregate(zip_with(vec, idx, (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: probe only vectors sharing the query's hyperplane
    * bucket (plus Hamming-1 neighbor buckets for recall). The scale path:
    * corpus bucketed once (write-time partition column at 100 TB), each
    * query touches B/2^planes of the data. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int, planes: Int = 6,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = hyperplaneSignature(col(vecCol), planes)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), sig.as("cb"))
    // query probes its own bucket + all hamming-1 buckets
    val probes = explode(array((lit(0L) +: (0 until planes).map(p =>
      shiftleft(lit(1L), p).cast("long"))): _*))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"), sig.as("qb"))
      .withColumn("flip", probes)
      .withColumn("probe_bucket", col("qb").bitwiseXOR(col("flip")))
    val scored = c.join(broadcast(q), col("cb") === col("probe_bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .select(col("query_id"), col("neighbor_id"), col("cos")).distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
