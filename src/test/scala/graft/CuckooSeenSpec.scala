package graft

import org.apache.spark.sql.functions._

import graft.queries.Fixture
import graft.seen.{CuckooSeen, ExactSeen}

/** Sharded cuckoo seen-set over the real fixture frontier: the gate has no
  * false negatives, the exact-confirm composition is row-equal to the plain
  * exact anti join, and forget() re-admits urls (the re-crawl path Bloom
  * cannot express). */
class CuckooSeenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val B = 8

  private def cand = Fixture.frontier(spark, dir)
    .select(graft.canon.UrlCanon.canonicalUrl(col("url")).as("canonical_url"))
    .distinct()
  private def seen = Fixture.seenSet(spark, dir)

  test("cuckoo fast-path composition is row-equal to the exact anti join") {
    val exact = ExactSeen.notSeen(cand, seen)
      .collect().map(_.getString(0)).toSet
    val fast = CuckooSeen.notSeenExactWithCuckooFastPath(cand, seen, B)
      .collect().map(_.getString(0)).toSet
    assert(fast == exact, s"fast-path diff: ${(fast diff exact).take(3)} / ${(exact diff fast).take(3)}")
  }

  test("memoized cached gate (c22's steady-state shape) is row-equal to exact; build runs once per corpus tag") {
    val exact = ExactSeen.notSeen(cand, seen).collect().map(_.getString(0)).toSet
    val tag = "spec-corpus-" + System.nanoTime() // fresh memo key per run
    val a = CuckooSeen.notSeenExactWithCuckooCached(tag, cand, seen, B, register = _ => ())
      .collect().map(_.getString(0)).toSet
    assert(a == exact, s"cached gate diff: ${(a diff exact).take(3)} / ${(exact diff a).take(3)}")
    // the per-JVM memo returns the SAME blob map on a second call — even
    // with a different (here: empty) seen input, proving no rebuild runs
    val m1 = CuckooSeen.shardsCached(tag, seen, B)
    val m2 = CuckooSeen.shardsCached(tag, seen.limit(0), B)
    assert(m1 eq m2, "second shardsCached call rebuilt instead of hitting the memo")
    val b = CuckooSeen.notSeenExactWithCuckooCached(tag, cand, seen, B, register = _ => ())
      .collect().map(_.getString(0)).toSet
    assert(b == exact)
    // corpus-changed protocol: evictShards drops the memo so the next call rebuilds
    CuckooSeen.evictShards(tag)
    val m3 = CuckooSeen.shardsCached(tag, seen, B)
    assert(!(m3 eq m1), "evictShards left the stale memo in place")
  }

  test("evictShards matches exact tag segments — a prefix tag cannot evict a longer tag's memo") {
    // memo keys are `tag#buckets#salt`; a bare startsWith(tag + "#") test
    // would let tag "x" evict tag "x#sub"'s live build (and the broadcast
    // cache's old contains("#tag#") could match another key's NUMERIC
    // geometry segments) — the eviction must parse segments exactly
    val base = "spec-seg-" + System.nanoTime()
    val tagSub = base + "#sub"
    val mSub = CuckooSeen.shardsCached(tagSub, seen, B)
    CuckooSeen.evictShards(base) // must NOT touch tagSub
    assert(CuckooSeen.shardsCached(tagSub, seen.limit(0), B) eq mSub,
      "evicting a prefix tag dropped a different tag's memo")
    CuckooSeen.evictShards(tagSub) // exact tag still evicts
    assert(!(CuckooSeen.shardsCached(tagSub, seen, B) eq mSub))
  }

  test("gate alone passes no seen url (no false negatives) and nearly all unseen") {
    val shards = CuckooSeen.buildShards(seen, B)
    val gated = CuckooSeen.gateNotSeen(cand, shards, B)
    // no seen url may survive the gate
    assert(ExactSeen.alreadySeen(gated, seen).count() == 0)
    // fp-bounded: ≥ 99.9% of truly-unseen urls pass (16-bit fingerprints)
    val unseen = ExactSeen.notSeen(cand, seen).count()
    assert(gated.count() >= unseen * 999 / 1000)
  }

  test("buildShards is duplicate-tolerant: a build stream with 8× repeated urls gates identically") {
    // the API contract must not require pre-distinct input (ADVICE r2): the
    // same seen set fed with every url repeated 8× builds shards that gate
    // EXACTLY like the deduped build — and does not throw on overflow
    val dup = (1 to 8).map(_ => seen).reduce(_ union _)
    val shardsDup = CuckooSeen.buildShards(dup, B, expectedPerShard = 4096)
    val shards = CuckooSeen.buildShards(seen, B, expectedPerShard = 4096)
    val a = CuckooSeen.gateNotSeen(cand, shardsDup, B).collect().map(_.getString(0)).toSet
    val b = CuckooSeen.gateNotSeen(cand, shards, B).collect().map(_.getString(0)).toSet
    assert(a == b, s"duplicate build diverged: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
  }

  test("forget() re-admits exactly the forgotten urls (re-crawl), collision-proof by rebuild") {
    import spark.implicits._
    val shards = CuckooSeen.buildShards(seen, B)
    val recrawl = seen.orderBy("canonical_url").limit(50)
    val updated = CuckooSeen.forget(shards, recrawl, seen, B)
    val gated = CuckooSeen.gateNotSeen(cand, shards, B)
    val gatedAfter = CuckooSeen.gateNotSeen(cand, updated, B)
    val reAdmitted = gatedAfter.exceptAll(gated).as[String].collect().toSet
    val expected = recrawl.as[String].collect().toSet
    assert(reAdmitted == expected,
      s"missing=${(expected diff reAdmitted).take(3)} extra=${(reAdmitted diff expected).take(3)}")
    // everything else is untouched
    assert(gatedAfter.count() == gated.count() + expected.size)
    // rebuild-from-truth: the load-bearing contract is NO FALSE NEGATIVE —
    // no still-seen url may pass the updated gate. Fingerprint deletion
    // could violate this via a (fp, bucket-pair) collision with a
    // forgotten key; the rebuild never deletes a fingerprint, so the
    // hazard is structurally impossible.
    assert(ExactSeen.alreadySeen(gatedAfter, seen.exceptAll(recrawl)).count() == 0,
      "a still-seen url passed the gate after forget()")
  }

  test("partitioned EXACT composition (past-broadcast-limit path) is row-equal to the exact anti join") {
    val exact = ExactSeen.notSeen(cand, seen)
      .collect().map(_.getString(0)).toSet
    val shards = CuckooSeen.buildShards(seen, B)
    val pinned = scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Dataset[_]]()
    val part = CuckooSeen.notSeenExactPartitioned(cand, shards, seen, B,
        graft.seen.BloomSeen.DefaultSalt, register = pinned += _)
      .collect().map(_.getString(0)).toSet
    pinned.foreach(_.unpersist())
    assert(part == exact, s"partitioned composition diff: ${(part diff exact).take(3)} / ${(exact diff part).take(3)}")
  }

  test("partitioned gate (shard-as-column, past-broadcast-limit path) == broadcast gate") {
    val shards = CuckooSeen.buildShards(seen, B)
    val bc = CuckooSeen.gateNotSeen(cand, shards, B)
      .collect().map(_.getString(0)).toSet
    val part = CuckooSeen.gateNotSeenPartitioned(cand, shards, B)
      .select("canonical_url").collect().map(_.getString(0)).toSet
    assert(part == bc, s"partitioned gate diverged: ${(part diff bc).take(3)} / ${(bc diff part).take(3)}")
  }

  test("insert() incrementally folds a batch into existing shards == one-shot build over the union") {
    // split the seen set: build over the first half, insert the second
    // half in two incremental rounds (micro-batch shape), compare the gate
    // against a from-scratch build over everything
    val ordered = seen.orderBy("canonical_url")
    val n = ordered.count().toInt
    val half = ordered.limit(n / 2)
    val rest = ordered.exceptAll(half)
    val b1 = rest.orderBy("canonical_url").limit((n - n / 2) / 2)
    val b2 = rest.exceptAll(b1)
    val incr = CuckooSeen.insert(
      CuckooSeen.insert(CuckooSeen.buildShards(half, B, expectedPerShard = 8192), b1, B),
      b2, B)
    val full = CuckooSeen.buildShards(seen, B, expectedPerShard = 8192)
    val a = CuckooSeen.gateNotSeen(cand, incr, B).collect().map(_.getString(0)).toSet
    val b = CuckooSeen.gateNotSeen(cand, full, B).collect().map(_.getString(0)).toSet
    // membership contract: no seen url survives either gate, and the
    // incremental set admits the same url population (fp sets may differ
    // only through table layout — fingerprints are identical, so they don't)
    assert(ExactSeen.alreadySeen(CuckooSeen.gateNotSeen(cand, incr, B), seen).count() == 0)
    assert(a == b, s"incremental diverged: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
  }

  test("insert() replay is idempotent and creates shards for previously-empty buckets") {
    import spark.implicits._
    // tiny build: 3 urls occupy few of the 8 buckets; inserting the full
    // seen set must create the missing shards
    val tiny = seen.orderBy("canonical_url").limit(3)
    val shards = CuckooSeen.buildShards(tiny, B, expectedPerShard = 8192)
    assert(shards.count() < B)
    val once = CuckooSeen.insert(shards, seen, B, expectedPerShard = 8192)
    val twice = CuckooSeen.insert(once, seen, B, expectedPerShard = 8192) // resume replays the batch
    assert(ExactSeen.alreadySeen(CuckooSeen.gateNotSeen(cand, twice, B), seen).count() == 0)
    // idempotent: replay changed no occupancy
    val n1 = once.collect().map(s => s.bucket -> s.n_items).toMap
    val n2 = twice.collect().map(s => s.bucket -> s.n_items).toMap
    assert(n1 == n2, s"replay changed occupancy: $n1 vs $n2")
  }
}
