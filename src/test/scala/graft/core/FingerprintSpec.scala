package graft.core

import org.scalatest.funsuite.AnyFunSuite

class FingerprintSpec extends AnyFunSuite {

  val textA = "the quick brown fox jumps over the lazy dog near the river bank today"
  val textB = "the quick brown fox jumps over the lazy dog near the river bank tonight"
  val textC = "completely different content about spark catalyst optimizer rules and shuffles"

  test("shingles and jaccard") {
    val a = Fingerprint.shingles(textA)
    val b = Fingerprint.shingles(textB)
    val c = Fingerprint.shingles(textC)
    assert(Fingerprint.jaccard(a, a) == 1.0)
    assert(Fingerprint.jaccard(a, b) > 0.7)
    assert(Fingerprint.jaccard(a, c) == 0.0)
  }

  test("minhash estimates jaccard") {
    val a = Fingerprint.minhash(Fingerprint.shingles(textA))
    val b = Fingerprint.minhash(Fingerprint.shingles(textB))
    val c = Fingerprint.minhash(Fingerprint.shingles(textC))
    assert(Fingerprint.estimatedJaccard(a, a) == 1.0)
    assert(Fingerprint.estimatedJaccard(a, b) > 0.5)
    assert(Fingerprint.estimatedJaccard(a, c) < 0.2)
  }

  test("near-dups share at least one LSH band") {
    val ka = Fingerprint.bandKeys(Fingerprint.minhash(Fingerprint.shingles(textA)))
    val kb = Fingerprint.bandKeys(Fingerprint.minhash(Fingerprint.shingles(textB)))
    val kc = Fingerprint.bandKeys(Fingerprint.minhash(Fingerprint.shingles(textC)))
    assert(ka.toSet.intersect(kb.toSet).nonEmpty)
    assert(ka.toSet.intersect(kc.toSet).isEmpty)
  }

  test("simhash hamming tracks similarity") {
    val ha = Fingerprint.simhash64(textA)
    val hb = Fingerprint.simhash64(textB)
    val hc = Fingerprint.simhash64(textC)
    assert(Fingerprint.hamming(ha, hb) < Fingerprint.hamming(ha, hc))
    assert(Fingerprint.hamming(ha, ha) == 0)
  }

  test("simhash blocks: close hashes share a block") {
    val h = Fingerprint.simhash64(textA)
    val h2 = h ^ 0x8001L // 2 bits flipped, distance 2 < 4 blocks
    val shared = Fingerprint.simhashBlocks(h).toSet.intersect(Fingerprint.simhashBlocks(h2).toSet)
    assert(shared.nonEmpty)
  }

  test("winnowing is deterministic and position-robust") {
    val w1 = Fingerprint.winnow(textA)
    val w2 = Fingerprint.winnow("PREFIX " + textA)
    assert(w1 == Fingerprint.winnow(textA))
    // most fingerprints survive a prefix shift
    val overlap = w1.toSet.intersect(w2.toSet).size.toDouble / w1.size
    assert(overlap > 0.6)
  }

  test("signatures are stable across runs (fixed seeds)") {
    assert(Fingerprint.hash64("abc") == Fingerprint.hash64("abc"))
    val sig = Fingerprint.minhash(Fingerprint.shingles("one two three four five"))
    assert(sig.toVector == Fingerprint.minhash(Fingerprint.shingles("one two three four five")).toVector)
  }
}
