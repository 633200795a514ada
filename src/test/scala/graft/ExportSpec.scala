package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Export

class ExportSpec extends SparkSpec {

  test("jsonl.gz export round-trips (K2)") {
    import spark.implicits._
    val df = Seq((1L, "hello \"quoted\"", 2.5), (2L, "tab\there", -1.0))
      .toDF("id", "s", "v")
    val out = Files.createTempDirectory("jsonl").toString + "/t"
    Export.toJsonlGz(df, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), s"expected gzip parts: ${files.mkString(",")}")
    val back = spark.read.json(out)
    assert(back.count() == 2)
    assert(back.filter(col("id") === 1).head().getAs[String]("s") == "hello \"quoted\"")
  }

  test("csv export flattens structs into dotted columns (K3 json_normalize semantics)") {
    import spark.implicits._
    val df = Seq((1L, ("a", 2)), (2L, ("b", 3))).toDF("id", "nested")
      .select(col("id"), col("nested").cast("struct<x:string,y:int>").as("nested"))
    val flat = Export.flattened(df)
    assert(flat.columns.toSeq == Seq("id", "nested.x", "nested.y"))
    val out = Files.createTempDirectory("csv").toString + "/t"
    Export.toCsvGz(df, out)
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")))
    // tab-separated + CRLF: inspect raw bytes of one part
    val part = new java.io.File(out).listFiles().find(_.getName.endsWith(".csv.gz")).get
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(part))
    val raw = new String(in.readAllBytes(), "UTF-8")
    assert(raw.contains("\t"), "tab separator missing")
    assert(raw.contains("\r\n"), "CRLF terminator missing")
    assert(raw.linesIterator.next().trim == "id\tnested.x\tnested.y")
  }

  test("SQL-callable custom functions via GraftExtensions") {
    // a fresh session with the extension (cannot mutate the shared one)
    val s2 = spark.newSession()
    graft.functions.GraftExtensions.register(s2)
    graft.model.Synth.imageDocs(s2, 10, 1).toDF().createOrReplaceTempView("image_docs")
    val row = s2.sql(
      s"""SELECT image_id, phash(bytes) AS p, decode_width(bytes) AS w,
        |  sniff_format(bytes) AS f, psnr(bytes, bytes) AS snr,
        |  decode_width(resize_nn(bytes, 8, 8)) AS rw, phash_d4(bytes) AS pd,
        |  letterbox(pad_image(bytes, ${graft.imagecodec.ImageCodec.packBorders(1, 2, 3, 4)})) AS lb,
        |  decode_width(crop_image(pad_image(bytes, ${graft.imagecodec.ImageCodec.packBorders(1, 2, 3, 4)}), letterbox(pad_image(bytes, ${graft.imagecodec.ImageCodec.packBorders(1, 2, 3, 4)})))) AS cw
        |FROM image_docs WHERE image_id = 'img00000003'""".stripMargin).head()
    assert(row.getAs[Long]("pd") ==
      graft.imagecodec.ImageCodec.phashD4OfEncoded(
        graft.model.Synth.makeImageDoc(3L).bytes))
    assert(row.getAs[Int]("w") == graft.model.Synth.wOf(3))
    assert(row.getAs[String]("f") == graft.model.Synth.fmtOf(3))
    assert(row.getAs[Double]("snr").isPosInfinity)
    assert(row.getAs[Int]("rw") == 8)
    assert(row.getAs[Int]("lb") == graft.imagecodec.ImageCodec.packBorders(1, 2, 3, 4))
    assert(row.getAs[Int]("cw") == graft.model.Synth.wOf(3))
    // video frame kernels: SQL extraction must agree with the fixture's
    // planted per-frame metadata
    graft.model.Synth.videoDocs(s2, 5, 1).toDF().createOrReplaceTempView("video_docs")
    val vrow = s2.sql(
      """SELECT frame_count(bytes) AS n,
        |  decode_width(frame_at(bytes, 1)) AS fw,
        |  sniff_format(frame_at(bytes, 1)) AS ff
        |FROM video_docs WHERE video_id = 'vid00000003'""".stripMargin).head()
    assert(vrow.getAs[Int]("n") == graft.model.Synth.videoFrameCountOf(3))
    assert(vrow.getAs[Int]("fw") == graft.model.Synth.videoFrameWOf(3, 1))
    assert(vrow.getAs[String]("ff") == graft.model.Synth.videoFrameFmtOf(3, 1))
    // audio kernel: SQL fold must match the codec's direct fold
    graft.model.Synth.audioDocs(s2, 5, 1).toDF().createOrReplaceTempView("audio_docs")
    val arow = s2.sql(
      "SELECT audio_stats(bytes) AS st FROM audio_docs WHERE audio_id = 'aud00000003'").head()
    assert(arow.getSeq[Long](0) ==
      graft.imagecodec.AudioCodec.statsOf(graft.model.Synth.makeAudioDoc(3L).bytes).toSeq)
    // signature/similarity kernels are SQL-callable too
    val sig = s2.sql(
      """SELECT shingles(split('a b c d', ' '), 3) AS sh,
        |  size(minhash_buckets(shingles(split('a b c d', ' '), 3), 4, 4)) AS nb,
        |  simhash_from_hashes(array(1L, 3L, 3L), 4) AS sim,
        |  vec_dot(array(1L, 2L), array(3L, 4L)) AS d""".stripMargin).head()
    assert(sig.getSeq[String](0).toSeq == Seq("a b c", "b c d"))
    assert(sig.getAs[Int]("nb") == 4)
    assert(sig.getAs[Long]("sim") == 3L) // bits 0,1 majority-positive
    assert(sig.getAs[Double]("d") == 11.0)
    // url + ANN kernels: SQL form must agree with the typed Column API
    import org.apache.spark.sql.functions.{col, lit, typedLit}
    val url = "HTTPS://Ex.ample.com:443/a/../b/?utm_source=x&q=1#frag"
    val vec = Seq(0.5f, -1.25f, 2.0f, 0.75f)
    val viaSql = s2.sql(
      s"""SELECT canonical_url('$url') AS cu, host_of('$url') AS h,
         |  hyperplane_sig(array(${vec.mkString("F,")}F), 16) AS hs""".stripMargin).head()
    val viaApi = s2.range(1).select(
      graft.canon.UrlCanon.canonicalUrl(lit(url)).as("cu"),
      graft.canon.UrlCanon.hostOf(lit(url)).as("h"),
      graft.functions.graftfns.hyperplaneSig(typedLit(vec), 16).as("hs")).head()
    assert(viaSql == viaApi, s"SQL/typed kernel divergence: $viaSql vs $viaApi")
  }
}
