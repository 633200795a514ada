package graft

import org.apache.spark.sql.functions._

import graft.canon.UrlCanon
import graft.refsim.ReferenceSim

class UrlCanonSpec extends SparkSpec {

  private val edgeCases = Seq(
    "https://H3.EXAMPLE.com:443/img/a_1.png#f",
    "https://h3.example.com/img/a_1.png",
    "http://Host.Example.COM:80/path?q=1#frag",
    "http://host.example.com:8080/path", // non-default port kept
    "https://host/img/UPPER_case_Path.PNG", // path case preserved
    "https://host:443/", // bare root
    "https://host:443", // no path at all
    "ftp://Mixed.Case:21/file",
    "https://host/a#b#c", // fragment contains '#'
    "https://host/img/x.png?query=KeepCase#drop")

  test("Column canonicalUrl matches the pure-Scala reference twin on edge cases") {
    import spark.implicits._
    val df = edgeCases.toDF("url")
      .select(col("url"),
        UrlCanon.canonicalUrl(col("url")).as("canon"),
        UrlCanon.hostOf(col("url")).as("host"))
    df.collect().foreach { r =>
      val url = r.getString(0)
      assert(r.getString(1) == ReferenceSim.canonicalUrl(url), s"canon mismatch for $url")
      assert(r.getString(2) == ReferenceSim.hostOf(url), s"host mismatch for $url")
    }
  }

  test("canonicalization semantics: fragment stripped, prefix lowercased, default ports removed") {
    assert(ReferenceSim.canonicalUrl("https://H3.EXAMPLE.com:443/img/A.png#f") ==
      "https://h3.example.com/img/A.png")
    assert(ReferenceSim.canonicalUrl("http://X.y:80/P") == "http://x.y/P")
    assert(ReferenceSim.canonicalUrl("http://x.y:8080/p") == "http://x.y:8080/p")
  }

  test("saltedBucket spreads a hot host across buckets (skew kill)") {
    import spark.implicits._
    // 1000 urls, ALL on one host — the worst-case hot host
    val urls = (0 until 1000).map(i => s"https://hot.example.com/img/img$i.png").toDF("url")
    val buckets = urls
      .select(UrlCanon.saltedBucket(col("url"), 0x5a17L, 32).as("b"))
      .groupBy("b").count().collect().map(_.getLong(1))
    assert(buckets.length == 32, "all 32 buckets used")
    assert(buckets.max <= 3L * buckets.min + 16, s"bucket skew too high: ${buckets.mkString(",")}")
  }

  test("canonicalization is idempotent (canonical(canonical(x)) == canonical(x))") {
    import spark.implicits._
    val urls = (0L until 2000L).map(graft.model.Synth.seedUrlOf) ++ edgeCases
    val df = urls.toDF("url")
      .select(UrlCanon.canonicalUrl(col("url")).as("c1"))
      .select(col("c1"), UrlCanon.canonicalUrl(col("c1")).as("c2"))
    assert(df.filter(col("c1") =!= col("c2")).count() == 0)
    urls.foreach { u =>
      val c = ReferenceSim.canonicalUrl(u)
      assert(ReferenceSim.canonicalUrl(c) == c, s"pure twin not idempotent on $u")
    }
  }

  test("filenameOf extracts the last path component (reference F9)") {
    import spark.implicits._
    val got = Seq("https://h/x/y/file.xml.gz").toDF("url")
      .select(UrlCanon.filenameOf(col("url"))).head().getString(0)
    assert(got == "file.xml.gz")
  }
}
