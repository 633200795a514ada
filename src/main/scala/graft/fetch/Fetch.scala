package graft.fetch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simulated fetch stage. The sandbox has no network, so "fetching" a url
  * resolves its payload from the image-docs store table by the image_id
  * embedded in the url path — the Spark-side plumbing (partitioning,
  * integrity check, lineage columns) is the real thing; only the socket is
  * fake.
  *
  * Reference analog: chunked download + md5 verification
  * (csinsights/client/dblpclient.py:72-88, 437-451). The md5-mismatch
  * quarantine reproduces the reference's post-download ValueError as a
  * status column instead of an exception, so one bad payload cannot kill a
  * 10^10-row job.
  *
  * Scale notes:
  *  - the batch side is re-partitioned by salted url hash BEFORE the join
  *    so a hot host's urls spread over all executors (north_rule);
  *  - `bytes` is joined in as late as possible and never carried through
  *    the scheduler shuffles (SURVEY §7 hard part 4);
  *  - the store side of the join is hash-partitioned on image_id; at
  *    100 TB both sides shuffle on image_id — AQE handles skew.
  */
object Fetch {

  /** image_id embedded in our synthetic urls: /img/<image_id>.<ext> */
  def imageIdOf(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(url, "/img/([^/.]+)\\.", 1)

  /** Resolve payloads for a scheduled (micro-)batch.
    *
    * @param batch    scheduled rows: canonical_url, host, batch_id, rank_in_batch
    * @param store    image-docs table: image_id, bytes, fmt, caption, phash
    * @param numPartitions salted-hash fan-out before the payload join
    */
  def fetchBatch(batch: DataFrame, store: DataFrame, numPartitions: Int,
      salt: Long = graft.seen.BloomSeen.DefaultSalt): DataFrame = {
    import graft.canon.UrlCanon
    val spread = batch
      .withColumn("image_id", imageIdOf(col("canonical_url")))
      .repartition(numPartitions, UrlCanon.saltedKey(col("canonical_url"), salt))
    val payload = store.select(
      col("image_id"),
      col("bytes"), col("fmt"), col("caption"), col("phash").as("store_phash"))
    spread
      .join(payload, Seq("image_id"), "left")
      .withColumn("status", when(col("bytes").isNull, lit(404)).otherwise(lit(200)))
      .withColumn("md5", when(col("bytes").isNotNull, md5(col("bytes"))))
      .select(
        col("canonical_url"), col("host"), col("batch_id"), col("rank_in_batch"),
        col("image_id"), col("status"), col("bytes"), col("md5"),
        col("fmt"), col("caption"), col("store_phash"))
  }

  /** Integrity gate (J4): rows whose recomputed md5 differs from the
    * expected digest are quarantined, not fatal. */
  def integritySplit(fetched: DataFrame, expected: DataFrame /* image_id, expected_md5 */)
      : (DataFrame, DataFrame) = {
    val joined = fetched.join(broadcast(expected), Seq("image_id"), "left")
    val ok = joined.filter(col("expected_md5").isNull || col("md5") === col("expected_md5"))
      .drop("expected_md5")
    val quarantined = joined.filter(col("expected_md5").isNotNull && col("md5") =!= col("expected_md5"))
      .drop("expected_md5")
    (ok, quarantined)
  }
}
