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

  test("fuzz: 2000 randomly-composed messy urls — Column kernel == pure twin, idempotent") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xf00dL) // seeded: deterministic fuzz
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    def mixCase(s: String): String =
      s.map(c => if (rnd.nextBoolean()) c.toUpper else c.toLower)
    val fuzzed = (0 until 2000).map { i =>
      val scheme = pick(Seq("http", "https", "ftp", "HTTPS", "Http"))
      val host = mixCase(pick(Seq("h1.example.com", "a.b.c.example.org", "xn--x.example", "localhost")))
      val port = pick(Seq("", ":80", ":443", ":8080", ":21", ":65535"))
      val path = pick(Seq("", "/", s"/Img/p$i.PNG", s"/a/b_$i", "/a%20b/c", "/trailing/"))
      val query = pick(Seq("", "?q=MiXeD", s"?a=$i&b=2"))
      val frag = pick(Seq("", "#f", "#a#b", "#"))
      s"$scheme://$host$port$path$query$frag"
    }
    val rows = fuzzed.toDF("url")
      .select(col("url"),
        UrlCanon.canonicalUrl(col("url")).as("c1"),
        UrlCanon.hostOf(col("url")).as("h"))
      .select(col("url"), col("c1"), col("h"),
        UrlCanon.canonicalUrl(col("c1")).as("c2"),
        UrlCanon.hostOf(col("c1")).as("h2"))
      .collect()
    rows.foreach { r =>
      val (url, c1, h, c2, h2) =
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4))
      assert(c1 == ReferenceSim.canonicalUrl(url), s"kernel != twin for $url")
      assert(h == ReferenceSim.hostOf(url), s"host mismatch for $url")
      assert(c2 == c1, s"not idempotent: $url → $c1 → $c2")
      assert(h2 == h, s"host unstable under canonicalization: $url")
    }
  }

  test("filenameOf extracts the last path component (reference F9)") {
    import spark.implicits._
    val got = Seq("https://h/x/y/file.xml.gz").toDF("url")
      .select(UrlCanon.filenameOf(col("url"))).head().getString(0)
    assert(got == "file.xml.gz")
  }
}
