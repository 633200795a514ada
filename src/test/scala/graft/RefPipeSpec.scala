package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.refpipe.RefPipe

/** Reference-semantics tests on the NATIVE S2 record shapes
  * (FIXTURES.md §6): edge rows exercise the openaccessinfo promotion, the
  * null-safe OR-filter, the empty-seen-set escape hatch, papers-wins merge
  * with merge-only survivors, and the authorId/authorid case quirk. */
class RefPipeSpec extends SparkSpec {

  private val eidType = MapType(StringType, StringType)
  private val papersSchema = StructType(Seq(
    StructField("corpusid", LongType),
    StructField("externalids", eidType),
    StructField("openaccessinfo", StructType(Seq(StructField("externalids", eidType)))),
    StructField("authors", ArrayType(StructType(Seq(StructField("authorId", StringType))))),
    StructField("title", StringType)))

  private def papersDf: DataFrame = {
    val rows = Seq(
      // plain DBLP paper
      Row(1L, Map("DBLP" -> "d1"), null, Seq(Row("a1"), Row("a2")), "t1"),
      // externalids only under openaccessinfo (F6 promotion required)
      Row(2L, null, Row(Map("ArXiv" -> "x2")), Seq(Row("a3")), "t2"),
      // nested map PRESENT → must overwrite the top-level one (F6)
      Row(3L, Map("PubMed" -> "p3"), Row(Map("DBLP" -> "d3")), Seq(Row("a1")), "t3"),
      // no matching source → filtered out by F4 (acl+dblp+arxiv enabled)
      Row(4L, Map("PubMed" -> "p4"), null, Seq(Row("a4")), "t4"),
      // null externalids everywhere → filtered out, null-safely
      Row(5L, null, null, Seq(Row("a5")), "t5"),
      // null entry VALUE for an enabled key → not "present and non-null"
      Row(6L, Map("DBLP" -> null), null, Seq(Row("a6")), "t6"),
      // openaccessinfo record PRESENT with null externalids → the null
      // REPLACES the good top-level DBLP id (s2processor.py:158-164:
      // key-present-with-None overwrites) and the paper drops out; a
      // coalesce would wrongly admit it
      Row(7L, Map("DBLP" -> "d7"), Row(null), Seq(Row("a7")), "t7"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), papersSchema)
  }

  private def abstractsDf: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "abs1"),   // matches admitted paper 1
      (4L, "abs4"),   // paper 4 was filtered → gated out
      (99L, "abs99")  // corpusid absent from papers → gated out too
    ).toDF("corpusid", "abstract")
  }

  private def authorsDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("a1", "http://a1", "Alice"),
      ("a3", "http://a3", "Carol"),
      ("a4", "http://a4", "Dan"), // only on filtered paper 4 → dropped
      ("zz", "http://zz", "Zoe")  // referenced by nobody → dropped
    ).toDF("authorid", "url", "name")
  }

  test("F6+F4: promotion then null-safe OR filter admits exactly {1,2,3}") {
    val got = RefPipe.externalIdFilter(
        RefPipe.promoteOpenAccess(papersDf), Seq("acl", "dblp", "arxiv"))
      .select("corpusid").collect().map(_.getLong(0)).toSet
    // 2 admitted only via promoted ArXiv id; 3 admitted only because the
    // NESTED map (DBLP) overwrote the top-level (PubMed); 7 REJECTED
    // because the present-but-null nested map overwrote its DBLP id
    assert(got == Set(1L, 2L, 3L))
  }

  test("F5: corpus gate keeps only seen ids; EMPTY seen-set admits everything (escape hatch)") {
    import spark.implicits._
    val seen = Seq(1L).toDF("corpusid")
    assert(RefPipe.corpusGate(abstractsDf, seen).select("corpusid")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    val empty = seen.filter(lit(false))
    assert(RefPipe.corpusGate(abstractsDf, empty).count() == 3)
  }

  test("J1: papers-wins merge; dataset-only rows survive with their values") {
    import spark.implicits._
    val papers = Seq((1L, "PT1"), (2L, "PT2")).toDF("corpusid", "title")
    val dataset = Seq((2L, "DT2", "abs2"), (7L, "DT7", "abs7")).toDF("corpusid", "title", "abstract")
    val got = RefPipe.mergeLww(dataset, papers).collect()
      .map(r => (r.getAs[Long]("corpusid"), r.getAs[String]("title"), r.getAs[String]("abstract")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "PT1", null),   // papers-only row
      (2L, "PT2", "abs2"), // conflict: papers title wins, dataset payload kept
      (7L, "DT7", "abs7"))) // dataset-only row survives (outer merge)
  }

  test("O1: null-corpusid rows rank first, then ascending, stable tiebreak") {
    import spark.implicits._
    val df = Seq(
      (java.lang.Long.valueOf(5L), "b"), (null.asInstanceOf[java.lang.Long], "a"),
      (java.lang.Long.valueOf(2L), "c"), (null.asInstanceOf[java.lang.Long], "d")
    ).toDF("corpusid", "tag")
    val ranked = RefPipe.o1Rank(df, Seq("tag")).orderBy("o1_rank")
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(ranked == Seq("a", "d", "c", "b"))
  }

  test("F7/F8: author filter honors the authorId/authorid case quirk and renames url") {
    val filtered = RefPipe.externalIdFilter(
      RefPipe.promoteOpenAccess(papersDf), Seq("acl", "dblp", "arxiv"))
    val got = RefPipe.filterAuthors(authorsDf, filtered)
    assert(got.columns.contains("s2url") && !got.columns.contains("url"))
    assert(got.select("authorid").collect().map(_.getString(0)).toSet == Set("a1", "a3"))
  }

  test("E3 end-to-end: process_data over native shapes") {
    val (merged, authors) = RefPipe.processData(
      papersDf, Seq(abstractsDf), authorsDf, Seq("acl", "dblp", "arxiv"))
    val byId = merged.collect().map(r => r.getAs[Long]("corpusid") -> r).toMap
    assert(byId.keySet == Set(1L, 2L, 3L)) // 99/4 gated, 4/5/6 filtered
    assert(byId(1L).getAs[String]("abstract") == "abs1")
    assert(byId(2L).getAs[String]("abstract") == null)
    assert(byId(1L).getAs[String]("title") == "t1") // papers side intact
    assert(authors.count() == 2)
  }
}
