package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.refpipe.DblpPipe
import graft.sources.XmlIngest

/** Real-XML-path tests: lineSep record framing over a multi-line dump with
  * header/footer (plain and gzip), StAX field extraction, and the E2
  * filter chain's sharp edges (missing @mdate raises; ee-without-type ≠
  * ee-missing; AccessType.ALL with filters on raises). */
class XmlIngestSpec extends SparkSpec {

  private val dump =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<dblp>
      |<article mdate="2024-02-01" key="k1">
      |  <title>First
      |paper</title>
      |  <author>Alice</author>
      |  <author>Bob</author>
      |  <year>2023</year>
      |  <ee type="oa">http://x/1</ee>
      |</article>
      |<article mdate="2024-01-05" key="k2">
      |  <title>Second</title>
      |  <author>Carol</author>
      |  <year>2022</year>
      |  <ee>http://x/2</ee>
      |</article>
      |<article mdate="2024-03-01" key="k3">
      |  <title>Third</title>
      |  <author>Dan</author>
      |  <year>2024</year>
      |</article>
      |</dblp>
      |""".stripMargin

  private def writeDump(gz: Boolean): String = {
    val dir = Files.createTempDirectory("xmldump")
    val f = dir.resolve(if (gz) "dblp.xml.gz" else "dblp.xml")
    val bytes = if (gz) {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(dump.getBytes(StandardCharsets.UTF_8)); g.close()
      bos.toByteArray
    } else dump.getBytes(StandardCharsets.UTF_8)
    Files.write(f, bytes)
    f.toString
  }

  test("file framing parses all records from a multi-line dump (plain and gzip)") {
    for (gz <- Seq(false, true)) {
      val recs = XmlIngest.readRecords(spark, writeDump(gz), "article")
        .collect().map(r => r.key -> r).toMap
      assert(recs.keySet == Set("k1", "k2", "k3"), s"gz=$gz")
      assert(recs("k1").title == "First\npaper") // multi-line text node
      assert(recs("k1").authors == Seq("Alice", "Bob"))
      assert(recs("k1").year.contains(2023))
      assert(recs("k1").eePresent && recs("k1").eeType == "oa")
      assert(recs("k2").eePresent && recs("k2").eeType == null) // ee w/o type
      assert(!recs("k3").eePresent && recs("k3").eeType == null) // no ee
    }
  }

  test("multi-type dump: records of every type are recovered, including between and after frames") {
    val mixed =
      """<?xml version="1.0"?>
        |<dblp>
        |<inproceedings mdate="2024-01-01" key="ip1"><title>IP one</title><author>Ann</author><year>2020</year></inproceedings>
        |<article mdate="2024-01-02" key="a1"><title>A one</title><author>Bob</author><year>2021</year><ee type="oa">http://x/a1</ee></article>
        |<phdthesis mdate="2024-01-03" key="t1"><title>Thesis</title><author>Cyd</author><year>2019</year></phdthesis>
        |<www mdate="2024-01-04" key="w1"><title>Home</title><author>Cyd</author></www>
        |<article mdate="2024-01-05" key="a2"><title>A two</title><author>Dee</author><year>2022</year></article>
        |<book mdate="2024-01-06" key="b1"><title>After last frame</title><author>Eve</author><year>2018</year></book>
        |</dblp>
        |""".stripMargin
    val dir = Files.createTempDirectory("xmlmixed")
    val f = dir.resolve("dblp.xml")
    Files.write(f, mixed.getBytes(StandardCharsets.UTF_8))
    // framed on </article> — ip1 rides inside frame 1, t1/w1 inside frame 2,
    // b1 lives AFTER the last article close (the trailing fragment)
    val recs = XmlIngest.readAllRecords(spark, f.toString, frameTag = "article")
      .collect().map(r => r.key -> r).toMap
    assert(recs.keySet == Set("ip1", "a1", "t1", "w1", "a2", "b1"), recs.keySet.toString)
    assert(recs("ip1").rtype == "inproceedings" && recs("ip1").year.contains(2020))
    assert(recs("a1").rtype == "article" && recs("a1").eeType == "oa")
    assert(recs("t1").rtype == "phdthesis")
    assert(recs("w1").rtype == "www" && recs("w1").year.isEmpty)
    assert(recs("b1").rtype == "book" && recs("b1").title == "After last frame")
  }

  test("splitDumpGz re-frames a monolithic gz dump into parallel-readable gzip parts, losslessly") {
    val mono = writeDump(gz = true) // single .gz: 1 reader, not splittable
    val out = Files.createTempDirectory("xmlsplit").toString + "/parts"
    XmlIngest.splitDumpGz(spark, mono, out, frameTag = "article", numFiles = 3)
    val parts = new java.io.File(out).listFiles().filter(_.getName.endsWith(".txt.gz"))
    assert(parts.length == 3, s"expected 3 gzip parts, got ${parts.map(_.getName).mkString(",")}")
    // lossless: the split dir parses to exactly the records of the original
    val orig = XmlIngest.readRecords(spark, mono, "article").collect().map(_.key).sorted
    val split = XmlIngest.readRecords(spark, out, "article").collect().map(_.key).sorted
    assert(split.sameElements(orig), s"split lost records: ${orig.mkString(",")} vs ${split.mkString(",")}")
    // and the read is parallel: one input partition per part file
    assert(XmlIngest.readRecordChunks(spark, out, "article").rdd.getNumPartitions >= 3)
  }

  test("mixed-content markup (<i>, <sub>, <ref>) is transparent: nested text stays in the field") {
    // real DBLP titles carry inline markup; xmltodict's view joins the
    // cdata around it — dropping nested text would silently truncate
    val mixed =
      """<?xml version="1.0"?>
        |<bib><article mdate="2020-01-01" key="mx1">
        |<title>On <i>Deep</i> Learning<sub>2</sub> Methods</title>
        |<author>A <i>B</i> C</author><year>2020</year>
        |</article></bib>""".stripMargin
    val dir = Files.createTempDirectory("xmlmixed")
    val f = dir.resolve("mixed.xml")
    Files.write(f, mixed.getBytes(StandardCharsets.UTF_8))
    val recs = XmlIngest.readAllRecords(spark, f.toString,
      frameTag = "article", rootTag = "bib").collect()
    assert(recs.length == 1)
    assert(recs(0).title == "On Deep Learning2 Methods", s"got: ${recs(0).title}")
    assert(recs(0).authors == Seq("A B C"))
  }

  test("access filter: ee-missing defaults to CLOSED; ee-without-type is dropped for every set") {
    val df = XmlIngest.readRecords(spark, writeDump(gz = false), "article").toDF()
    assert(DblpPipe.accessFilter(df, Seq("oa")).select("key")
      .collect().map(_.getString(0)).toSet == Set("k1"))
    // k3 (no ee) admitted under CLOSED; k2 (typeless ee) never admitted
    assert(DblpPipe.accessFilter(df, Seq("closed")).select("key")
      .collect().map(_.getString(0)).toSet == Set("k3"))
    assert(DblpPipe.accessFilter(df, Seq("oa", "closed")).select("key")
      .collect().map(_.getString(0)).toSet == Set("k1", "k3"))
  }

  test("timestamp filter is strictly greater; missing @mdate raises like the reference") {
    val df = XmlIngest.readRecords(spark, writeDump(gz = false), "article").toDF()
    assert(DblpPipe.timestampFilter(df, "2024-02-01").select("key")
      .collect().map(_.getString(0)).toSet == Set("k3")) // boundary k1 excluded
    val noMdate = df.withColumn("mdate",
      when(col("key") === "k2", lit(null).cast("string")).otherwise(col("mdate")))
    val ex = intercept[Exception] {
      DblpPipe.timestampFilter(noMdate, "1980-01-01").count()
    }
    assert(ex.getMessage.contains("mdate") ||
      Option(ex.getCause).exists(_.getMessage.contains("mdate")))
  }

  test("AccessType.ALL with filters enabled raises (reference latent bug mirrored)") {
    val df = XmlIngest.readRecords(spark, writeDump(gz = false), "article").toDF()
    intercept[IllegalStateException] {
      DblpPipe.downloadAndFilterRelease(df, useFilters = true, Seq(DblpPipe.AccessAll))
    }
    // filters off: everything passes untouched
    assert(DblpPipe.downloadAndFilterRelease(df, useFilters = false, Seq("oa")).count() == 3)
  }
}
