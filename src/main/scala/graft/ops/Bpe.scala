package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Byte-pair-encoding merge-table training — the iterative tokenizer-
  * training loop whose FIRST pair count is the v2_bpe_pairs query.
  * Reference semantics (Sennrich et al. 2016, the GPT-2 trainer): words
  * start character-split; each round counts adjacent symbol pairs
  * weighted by word frequency, merges the most frequent pair everywhere
  * (ties broken lexicographically so training is deterministic), and
  * repeats.
  *
  * Scale shape: BPE trains over the WORD-FREQUENCY table, not the
  * corpus — one corpus-wide shuffle builds `(word, freq)` and every
  * merge round runs over that far smaller table (Zipf: a 100 TB corpus
  * collapses to ~10^7 distinct words). The rounds run on RDDs for the
  * same measured reason as the CC loop (driver-side Catalyst
  * recompilation of an identically-shaped plan dominates small
  * closures), with lineage truncated on the shared [[IterSupport]]
  * policy. The per-round driver step is ONE top-1 pair via
  * `takeOrdered(1)` — per-partition top-1 then a k-way merge, never a
  * collect — which is the algorithm's inherent sequential dependency:
  * round r's counts are defined over round r-1's merge applied
  * everywhere. */
object Bpe {

  /** Greedy left-to-right merge application (the reference tokenizer's
    * scan): non-overlapping occurrences of (l, r) collapse to l+r.
    * Returns the INPUT array unchanged (no allocation) when the pair does
    * not occur — in a merge-table replay most rounds touch nothing, so
    * the cheap presence scan saves the per-round copy. */
  private[graft] def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    var at = -1
    var i = 0
    while (at < 0 && i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) at = i
      i += 1
    }
    if (at < 0) return syms
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Round ordering: frequency DESC, then (lhs, rhs) lexicographic ASC —
    * the deterministic tie-break both the distributed loop and the spec's
    * single-node reference share. */
  private val bestPair: Ordering[((String, String), Long)] =
    Ordering.by { case ((l, r), c) => (-c, l, r) }

  /** Train `numMerges` merges over a text corpus. Output one row per
    * learned merge: (merge_rank, lhs, rhs, pair_freq), rank 1-based in
    * learning order. Stops early (fewer rows) if the vocab runs out of
    * adjacent pairs. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")

    // corpus → word-frequency table: the ONLY corpus-sized pass
    val words = docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .as[(String, Long)]

    val reliable = spark.sparkContext.getCheckpointDir.isDefined
    var vocab: RDD[(Array[String], Long)] =
      words.rdd.map { case (w, f) => (w.map(_.toString).toArray, f) }
    vocab.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    // ONE job per round: the takeOrdered below is the action that
    // materializes the current vocab's (lazy) truncation point — the
    // former explicit next.count() doubled every round's job count. The
    // parent round's blocks are released only AFTER the child is
    // materialized by that action (prev), so no round ever recomputes.
    var prev: RDD[(Array[String], Long)] = null
    var rank = 1
    var done = false
    try {
      while (rank <= numMerges && !done) {
        val top = vocab.flatMap { case (syms, f) =>
          Iterator.range(0, syms.length - 1).map(i => ((syms(i), syms(i + 1)), f))
        }.reduceByKey(_ + _).takeOrdered(1)(bestPair)
        if (prev != null) { prev.unpersist(); prev = null } // vocab is materialized now
        if (top.isEmpty) done = true
        else {
          val ((l, r), c) = top(0)
          merges += ((rank.toLong, l, r, c))
          if (rank < numMerges) { // the last merge is never re-applied
            val next = vocab.map { case (syms, f) => (applyMerge(syms, l, r), f) }
            IterSupport.truncateRdd(next, reliable) // lazy; next round's action materializes
            prev = vocab
            vocab = next
          }
          rank += 1
        }
      }
    } finally {
      vocab.unpersist()
      if (prev != null) { prev.unpersist(); () }
    }

    val schema = StructType(Seq(
      StructField("merge_rank", LongType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_freq", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        merges.toSeq.map { case (k, l, r, c) => Row(k, l, r, c) }, 1),
      schema)
  }

  /** Encode a corpus with a learned merge table: per word, replay the
    * merges in rank order (the reference tokenizer's slow-but-exact
    * form; production encoders keep a pair-priority heap per word — the
    * OUTPUT is identical, this is the semantics anchor). Emits one row
    * per doc: `(doc_id, n_subwords, encoded_md5)` where the md5 hashes
    * the doc's full subword sequence space-joined — so any divergence in
    * merge order or application is a value diff, not just a count.
    *
    * Scale shape: the merge table is vocab-scoped and rank-ordered —
    * BROADCAST state by definition (a 50k-merge GPT-2-sized table is
    * ~1 MB); the encode itself is one row-local map over the corpus, no
    * shuffle at any size. The `collect` here gathers that table, never
    * corpus data. */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table: Array[(String, String)] = merges
      .orderBy(col("merge_rank"))
      .select(col("lhs"), col("rhs"))
      .as[(String, String)].collect()
    val bc = spark.sparkContext.broadcast(table)
    val out = docs
      .select(col(idCol).cast("long").as("doc_id"),
        split(trim(lower(col(textCol))), "\\s+").as("words"))
      .as[(Long, Array[String])]
      // mapPartitions so the per-WORD merge replay is memoized once per
      // task: the corpus is Zipf — the same words recur across (and
      // within) documents, and replaying a 50k-rank merge table per
      // OCCURRENCE is the encode's whole cost. The memo is capped so a
      // pathological all-unique-words partition stays memory-bounded
      // (past the cap, words encode uncached — same output, just slower).
      // Output is byte-identical to the per-occurrence replay.
      .mapPartitions { rows =>
        val t = bc.value
        val memo = new java.util.HashMap[String, Array[String]]()
        val memoCap = 1 << 20
        def encodeWord(w: String): Array[String] = {
          val hit = memo.get(w)
          if (hit != null) hit
          else {
            var syms = w.map(_.toString).toArray
            var i = 0
            while (i < t.length && syms.length > 1) {
              syms = applyMerge(syms, t(i)._1, t(i)._2); i += 1
            }
            if (memo.size < memoCap) memo.put(w, syms)
            syms
          }
        }
        rows.map { case (id, ws) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          var n = 0L
          var first = true
          ws.foreach { w =>
            val syms = encodeWord(w)
            n += syms.length
            syms.foreach { s =>
              if (!first) md.update(' '.toByte)
              md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              first = false
            }
          }
          (id, n, md.digest().map("%02x".format(_)).mkString)
        }
      }
      .toDF("doc_id", "n_subwords", "encoded_md5")
    out
  }
}
