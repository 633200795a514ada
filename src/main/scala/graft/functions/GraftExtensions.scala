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
    ("resize_nn", "resize_nn(bytes, w, h) - nearest-neighbor resize, re-encoded in the same format",
      args => ResizeExpr(args.head, args(1), args(2))))

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
