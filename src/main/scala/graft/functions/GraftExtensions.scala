package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers the custom Catalyst expressions as SQL-callable functions:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql.extensions=graft.functions.GraftExtensions
  *   spark.sql("SELECT phash(bytes), sniff_format(bytes) FROM image_docs")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), GraftExtensions.info(name, usage), builder))
    }
}

object GraftExtensions {
  private[functions] def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("phash", "phash(bytes) - 64-bit perceptual average-hash of an encoded image",
      args => PhashExpr(args.head)),
    ("phash_d4", "phash_d4(bytes) - dihedral-canonical phash: unsigned-min over all 8 rotations/mirrors",
      args => PhashD4Expr(args.head)),
    ("decode_width", "decode_width(bytes) - image width from the payload header",
      args => DecodeWidthExpr(args.head)),
    ("decode_height", "decode_height(bytes) - image height from the payload header",
      args => DecodeHeightExpr(args.head)),
    ("sniff_format", "sniff_format(bytes) - image format from magic bytes",
      args => SniffFormatExpr(args.head)),
    ("psnr", "psnr(a, b) - PSNR in dB between two encoded images",
      args => PsnrExpr(args.head, args(1))),
    ("bloom_might_contain", "bloom_might_contain(blob, key) - Bloom shard membership probe",
      args => BloomMightContainExpr(args.head, args(1))),
    ("cuckoo_might_contain", "cuckoo_might_contain(blob, key) - cuckoo shard membership probe",
      args => CuckooMightContainExpr(args.head, args(1))),
    ("resize_nn", "resize_nn(bytes, w, h) - nearest-neighbor resize, re-encoded in the same format",
      args => ResizeExpr(args.head, args(1), args(2))),
    ("pad_image", "pad_image(bytes, packed) - uniform black letterbox border (packed t<<24|b<<16|l<<8|r), re-encoded in the same format",
      args => PadImageExpr(args.head, args(1))),
    ("letterbox", "letterbox(bytes) - detected uniform border widths of the decoded image, packed t<<24|b<<16|l<<8|r",
      args => LetterboxExpr(args.head)),
    ("crop_image", "crop_image(bytes, packed) - strip a packed (t<<24|b<<16|l<<8|r) border, re-encoded in the same format (inverse of pad_image)",
      args => CropImageExpr(args.head, args(1))),
    ("shingles", "shingles(toks, k) - word k-gram strings from a token array",
      args => ShinglesExpr(args.head, litInt(args(1)))),
    ("minhash_buckets", "minhash_buckets(shingles, numBands, rowsPerBand) - per-band minhash LSH buckets",
      args => MinhashBucketsExpr(args.head, litInt(args(1)), litInt(args(2)))),
    ("simhash_from_hashes", "simhash_from_hashes(hashes, bits) - packed simhash of a token-hash array",
      args => SimhashFromHashesExpr(args.head, litInt(args(1)))),
    ("vec_dot", "vec_dot(a, b) - double dot product of two numeric arrays",
      args => DotExpr(args.head, args(1))),
    ("robots_verdict", "robots_verdict(url, rules) - longest-prefix robots verdict (NULL = no rule matches)",
      args => RobotsVerdictExpr(args.head, args(1))),
    ("hyperplane_sig", "hyperplane_sig(vec, planes) - packed sign-bit LSH signature of a numeric vector against deterministic hyperplanes",
      args => HyperplaneSigExpr(args.head, litInt(args(1)))),
    ("canonical_url", "canonical_url(url) - crawl-canonical form of a url (scheme/host lowering, default port, dot-segments, tracking params, fragment)",
      args => CanonicalUrlExpr(args.head)),
    ("host_of", "host_of(url) - lowercased host component of a url",
      args => HostOfExpr(args.head)),
    ("repetition_stats", "repetition_stats(text) - [n_words, n_distinct_words, max_word_count, n_bigrams, n_distinct_bigrams, max_bigram_count] repetition metrics",
      args => RepetitionStatsExpr(args.head)),
    ("frame_count", "frame_count(video) - frame count from a GVID container header",
      args => FrameCountExpr(args.head)),
    ("frame_at", "frame_at(video, i) - encoded frame i of a GVID container (seek-index slice)",
      args => FrameAtExpr(args.head, args(1))),
    ("audio_stats", "audio_stats(audio) - [sample_rate, n_samples, duration_ms, peak_abs, sum_sq] from a GAUD PCM payload",
      args => AudioStatsExpr(args.head)))
  // Not SQL-registered, by design: the broadcast probes (BloomProbeExpr/
  // CuckooProbeExpr) close over a Broadcast handle and the shard-as-column
  // probes carry a gate epoch — both are plan-construction artifacts with
  // no sensible SQL literal form; nearest_cluster takes a centroid matrix
  // (driver state). Use the typed graftfns/gate entry points for those.

  /** Foldable-int argument for SQL-facing parameterized kernels. */
  private def litInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case l: Long => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"expected a literal integer argument, got $other")
  }

  /** Register on a live session (the withExtensions path requires building
    * a brand-new session; this one works on an existing/new-child one). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    all.foreach { case (name, usage, builder) =>
      reg.registerFunction(FunctionIdentifier(name), info(name, usage), builder)
    }
  }
}
