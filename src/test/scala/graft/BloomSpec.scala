package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.imagecodec.ImageCodec
import graft.seen.Bloom

class BloomSpec extends AnyFunSuite {

  private def keys(seed: Long, n: Int): Seq[Long] =
    (0 until n).map(i => ImageCodec.mix64(seed ^ i))

  test("no false negatives (the load-bearing Bloom property)") {
    val b = Bloom.create(10000, 1e-4)
    val ks = keys(1L, 10000)
    ks.foreach(b.put)
    assert(ks.forall(b.mightContain))
  }

  test("false positive rate near target") {
    val b = Bloom.create(10000, 1e-3)
    keys(2L, 10000).foreach(b.put)
    val probes = keys(0x0ddba11L, 100000)
    val fp = probes.count(b.mightContain).toDouble / probes.size
    assert(fp < 5e-3, s"fp=$fp")
  }

  test("serialization round-trips") {
    val b = Bloom.create(1000, 1e-4)
    val ks = keys(3L, 1000)
    ks.foreach(b.put)
    val b2 = Bloom.deserialize(b.serialize())
    assert(ks.forall(b2.mightContain))
    assert(b2.numHashes == b.numHashes && b2.bits.sameElements(b.bits))
  }

  test("merge is associative/commutative and equals single-pass build") {
    def fresh() = Bloom.create(3000, 1e-4)
    val (ka, kb, kc) = (keys(10L, 1000), keys(11L, 1000), keys(12L, 1000))
    val (a, b, c) = (fresh(), fresh(), fresh())
    ka.foreach(a.put); kb.foreach(b.put); kc.foreach(c.put)
    val left = Bloom.merge(Bloom.merge(a, b), c)
    val right = Bloom.merge(a, Bloom.merge(b, c))
    assert(left.bits.sameElements(right.bits))
    val comm = Bloom.merge(b, a)
    assert(Bloom.merge(a, b).bits.sameElements(comm.bits))
    val single = fresh()
    (ka ++ kb ++ kc).foreach(single.put)
    assert(left.bits.sameElements(single.bits))
  }

  test("sizing caps bits for memory safety") {
    val huge = Bloom.create(100000000000L, 1e-6, maxBits = 1L << 20)
    assert(huge.numBits == (1L << 20))
  }

  test("scalacheck: arbitrary key partitions — merge of partial builds == single-pass build, no FN") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genKeys = Gen.listOfN(400, Gen.long)
    val genCut = Gen.choose(0, 400)
    val prop = Prop.forAll(genKeys, genCut) { (ks: List[Long], cut0: Int) =>
      val cut = math.min(cut0, ks.length)
      val (l, r) = ks.splitAt(cut)
      def fresh() = Bloom.create(500, 1e-4)
      val (a, b, single) = (fresh(), fresh(), fresh())
      l.foreach(a.put); r.foreach(b.put); ks.foreach(single.put)
      val merged = Bloom.merge(a, b)
      // merge equals the single-pass filter BIT-FOR-BIT, and every key is
      // queryable (no false negatives) — for ANY key set and ANY cut point
      merged.bits.sameElements(single.bits) && ks.forall(merged.mightContain)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  test("scalacheck: cuckoo insert/delete churn never loses a live key (set semantics)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.seen.Cuckoo
    // ops: (key, isDelete) — a delete only fires if the key is live. The
    // filter is a SET (inserts idempotent — duplicate keys in a seen-set
    // build must not overfill shards), so the model is a Set too: a key is
    // live iff inserted since its last delete, however many times.
    val genOps = Gen.listOfN(300, Gen.zip(Gen.choose(0L, 120L), Gen.prob(0.3)))
    val prop = Prop.forAll(genOps) { ops: List[(Long, Boolean)] =>
      val f = Cuckoo.create(600)
      val live = scala.collection.mutable.Set[Long]()
      ops.foreach { case (k0, del) =>
        val k = ImageCodec.mix64(k0) // spread the narrow key domain
        if (del && live(k)) { f.delete(k); live -= k }
        else if (!del) { f.insert(k); live += k }
      }
      live.forall(f.mightContain)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }
}
