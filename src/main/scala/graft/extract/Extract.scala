package graft.extract

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.graftfns
import graft.imagecodec.ImageCodec

/** Per-document extraction/preprocessing stage, re-expressed as Catalyst
  * expressions (cheap header work: dims, format sniff, phash) and typed
  * `mapPartitions` (decode-heavy work) — never RDDs (BASELINE.json
  * input_hint).
  *
  * Reference analog: the extraction stage the reference declares but never
  * implements (`PdfExtractionFn`, csinsights/helpers/types.py:73-89) plus
  * the field-promotion/rename normalizations it does implement
  * (csinsights/data/s2processor.py:158-164, 188-196).
  */
object Extract {

  /** Cheap metadata: header-only dims + sniffed format + phash, all inside
    * WholeStageCodegen (custom expressions with doGenCode). */
  def metadata(fetched: DataFrame): DataFrame =
    fetched
      .withColumn("dec_fmt", graftfns.sniffFormat(col("bytes")))
      .withColumn("dec_w", graftfns.decodeWidth(col("bytes")))
      .withColumn("dec_h", graftfns.decodeHeight(col("bytes")))
      .withColumn("dec_phash", graftfns.phash(col("bytes")))

  /** Caption normalization: collapse whitespace runs, trim. Pure built-in
    * Column functions (codegen'd). Reference analog: F8 rename +
    * whitespace-sensitive CSV flatten (s2processor.py:231-257). */
  def normalizeCaption(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** Decode-heavy path as typed mapPartitions: full pixel decode + quality
    * stats. Iterator-in/iterator-out (constant memory per partition —
    * chunked-I/O analog of dblpclient.py:53-88). */
  def decodeStats(docs: Dataset[graft.model.ImageDoc]): Dataset[DecodedStats] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      it.map { d =>
        val (px, w, h) = ImageCodec.decode(d.bytes)
        var sum = 0L
        var i = 0
        while (i < px.length) { sum += (px(i) & 0xff); i += 1 }
        val mean = if (px.length == 0) 0.0 else sum.toDouble / px.length
        var varAcc = 0.0
        i = 0
        while (i < px.length) { val dlt = (px(i) & 0xff) - mean; varAcc += dlt * dlt; i += 1 }
        DecodedStats(d.image_id, w, h, mean,
          if (px.length == 0) 0.0 else math.sqrt(varAcc / px.length),
          ImageCodec.averageHash(px, w, h))
      }
    }
  }

  /** phash near-dup groups: exact phash match after decode (the synthetic
    * corpus injects ~2% duplicate pixel patterns — FIXTURES.md §1). At
    * scale this is one shuffle on an 8-byte key. */
  def phashDupGroups(withMeta: DataFrame): DataFrame =
    withMeta
      .groupBy(col("dec_phash"))
      .agg(count(lit(1)).as("n"), min(col("image_id")).as("canonical_id"))
      .filter(col("n") > 1)

  /** phash hamming-ball near-dup PAIRS (lossy re-encodes, small crops —
    * payloads whose 64-bit phash differs in ≤ maxHamming bits). Runs the
    * banded signature self-join shared with text simhash
    * ([[graft.ops.Dedup.hammingCandidates]]): with maxHamming < numBands
    * the result is provably the complete hamming ball, computed without an
    * all-pairs join. Emits (id_a, id_b, hamming). */
  def phashNearDupPairs(withMeta: DataFrame, maxHamming: Int = 6,
      numBands: Int = 8): DataFrame =
    graft.ops.Dedup.hammingCandidates(
      withMeta.select(col("image_id"), col("dec_phash")),
      "image_id", "dec_phash", maxHamming, numBands)
}

final case class DecodedStats(
    image_id: String, w: Int, h: Int, mean: Double, stddev: Double, phash: Long)
