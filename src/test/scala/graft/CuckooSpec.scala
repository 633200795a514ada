package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.seen.Cuckoo

/** Cuckoo-filter laws: no false negatives, bounded false positives at the
  * sized load, working deletion (the capability Bloom lacks), deterministic
  * serialized form, involution of the partial-key bucket walk. */
class CuckooSpec extends AnyFunSuite {

  private def keys(n: Int, seed: Long): Array[Long] =
    Array.tabulate(n)(i => graft.seen.Bloom.mixStatic(seed + i))

  test("insert is idempotent: duplicate keys cannot overfill a shard, delete fully removes them") {
    // a tiny filter sized for 100 items absorbs 10,000 inserts of the SAME
    // 50 keys — under counting semantics the displacement chain would be
    // unsatisfiable after ~2×bucketSize copies of any one key
    val f = Cuckoo.create(100)
    val ks = keys(50, 0x7e57L)
    (0 until 200).foreach(_ => ks.foreach(k => assert(f.insert(k), "duplicate insert overflowed")))
    assert(ks.forall(f.mightContain))
    assert(f.occupiedSlots <= 50, s"duplicates stored copies: ${f.occupiedSlots} slots for 50 keys")
    // set semantics: one delete removes the key no matter how often inserted
    assert(f.delete(ks(0)))
    assert(!f.mightContain(ks(0)))
  }

  test("no false negatives at sized load; all sized inserts succeed") {
    val n = 50000
    val f = Cuckoo.create(n)
    val ks = keys(n, 0xabc1L)
    ks.foreach(k => assert(f.insert(k), s"insert failed below sized load"))
    assert(ks.forall(f.mightContain), "false negative")
    assert(f.occupancy <= 0.85, f"occupancy ${f.occupancy}%.3f")
  }

  test("false-positive rate stays near the 16-bit-fingerprint bound") {
    val n = 50000
    val f = Cuckoo.create(n)
    keys(n, 0xabc1L).foreach(f.insert)
    val probes = keys(100000, 0x99990000000L) // seed range disjoint from inserts
    val fp = probes.count(f.mightContain)
    // theoretical ≈ 2*4/2^16 ≈ 0.012%; allow 10× slack
    assert(fp <= probes.length / 1000, s"$fp false positives in ${probes.length}")
  }

  test("delete removes a key and permits re-insert (re-crawl path)") {
    val f = Cuckoo.create(1000)
    val ks = keys(100, 0x77L)
    ks.foreach(f.insert)
    val victim = ks(42)
    assert(f.mightContain(victim))
    assert(f.delete(victim))
    assert(!f.mightContain(victim), "deleted key still visible")
    assert(ks.filterNot(_ == victim).forall(f.mightContain), "delete disturbed others")
    assert(f.insert(victim) && f.mightContain(victim))
    // deleting a never-inserted key reports absence
    assert(!f.delete(keys(1, 0x5555L)(0)))
  }

  test("serialized form is deterministic and round-trips") {
    def build() = { val f = Cuckoo.create(5000); keys(5000, 1L).foreach(f.insert); f }
    val a = build().serialize()
    val b = build().serialize()
    assert(java.util.Arrays.equals(a, b), "same inserts, different bytes")
    val back = Cuckoo.deserialize(a)
    assert(keys(5000, 1L).forall(back.mightContain))
  }

  test("displacement chains preserve membership under heavy churn") {
    val f = Cuckoo.create(2000)
    val ks = keys(2000, 0xfeedL)
    ks.foreach(f.insert) // fills to the sizing load → kicks happen
    assert(ks.forall(f.mightContain), "displacement lost a key")
    // churn: delete/re-insert every 3rd key twice
    (0 until 2) foreach { _ =>
      ks.indices.by(3).foreach(i => f.delete(ks(i)))
      ks.indices.by(3).foreach(i => assert(f.insert(ks(i))))
    }
    assert(ks.forall(f.mightContain))
  }
}
