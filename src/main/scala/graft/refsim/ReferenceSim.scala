package graft.refsim

import scala.collection.mutable

/** Pure-Scala (no Spark) re-execution of the reference crawler's
  * sequential semantics, used as the golden oracle for crawl order and
  * URL-seen membership (SURVEY.md §5: the reference has no test suite, so
  * the oracle is a tiny reimplementation of its semantics).
  *
  * Semantics mirrored:
  *  - strictly sequential fetch in seed order
  *    (csinsights/client/s2client.py:146-157);
  *  - skip-if-already-fetched before download
  *    (csinsights/client/dblpclient.py:437-443) — here: canonical-url
  *    seen-set, first occurrence wins;
  *  - robots/politeness: the reference is single-stream (budget 1);
  *    generalized per-host budgets follow the same rank rule.
  */
object ReferenceSim {

  final case class Crawled(canonicalUrl: String, host: String, batchId: Long, rankInBatch: Int)

  /** Pure-Scala twin of graft.canon.UrlCanon.canonicalUrl — string
    * semantics must match the Column version bit-for-bit (tested). */
  def canonicalUrl(url: String): String = {
    val nofrag = url.takeWhile(_ != '#')
    val m = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*".r.findFirstIn(nofrag).getOrElse("")
    val rest = nofrag.substring(m.length)
    val lowered = m.toLowerCase
    val noPort =
      if (lowered.endsWith(":443")) lowered.dropRight(4)
      else if (lowered.endsWith(":80")) lowered.dropRight(3)
      else lowered
    noPort + rest
  }

  def hostOf(url: String): String = {
    val m = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:#?]*)".r.findFirstMatchIn(url)
    m.map(_.group(1).toLowerCase).getOrElse("")
  }

  def pathOf(canonicalUrl: String): String =
    "^[a-z][a-z0-9+.-]*://[^/]*".r.findFirstIn(canonicalUrl)
      .map(p => canonicalUrl.substring(p.length)).getOrElse(canonicalUrl)

  /** Sequential reference-equivalence crawl: budget-1 single queue.
    * Returns (crawl order, final seen set). Seeds must be in seed_rank
    * order. `disallow` maps host → disallowed path prefix ("" = none). */
  def crawlSequential(
      seedUrls: Seq[String],
      disallow: Map[String, String] = Map.empty): (Vector[Crawled], Set[String]) = {
    val seen = mutable.LinkedHashSet[String]()
    val order = Vector.newBuilder[Crawled]
    var batch = 0L
    seedUrls.foreach { u =>
      val cu = canonicalUrl(u)
      val h = hostOf(u)
      val blockedPrefix = disallow.getOrElse(h, "")
      val blocked = blockedPrefix.nonEmpty && pathOf(cu).startsWith(blockedPrefix)
      if (!blocked && !seen.contains(cu)) {
        seen += cu
        order += Crawled(cu, h, batch, 0)
        batch += 1
      }
    }
    (order.result(), seen.toSet)
  }

  /** Generalized politeness crawl: per-host budget, rank by
    * (priority, seed_rank, canonical_url) — the window-rank rule the Spark
    * scheduler implements declaratively. */
  def crawlPoliteness(
      seeds: Seq[(String, Long, Long)], // (url, seed_rank, priority)
      budget: Int,
      disallow: Map[String, String] = Map.empty): Vector[Crawled] = {
    // dedup: first occurrence by (priority, seed_rank)
    val byCanon = mutable.Map[String, (String, Long, Long, String)]()
    seeds.foreach { case (u, sr, pr) =>
      val cu = canonicalUrl(u)
      val h = hostOf(u)
      val blockedPrefix = disallow.getOrElse(h, "")
      if (!(blockedPrefix.nonEmpty && pathOf(cu).startsWith(blockedPrefix))) {
        val cand = (cu, pr, sr, h)
        byCanon.get(cu) match {
          case Some((_, p0, s0, _)) if p0 < pr || (p0 == pr && s0 <= sr) => ()
          case _ => byCanon(cu) = cand
        }
      }
    }
    byCanon.values.toVector
      .groupBy(_._4)
      .flatMap { case (h, rows) =>
        rows.sortBy(r => (r._2, r._3, r._1)).zipWithIndex.map { case (r, i) =>
          Crawled(r._1, h, i.toLong / budget, i % budget)
        }
      }
      .toVector
      .sortBy(c => (c.batchId, c.host, c.rankInBatch))
  }
}
