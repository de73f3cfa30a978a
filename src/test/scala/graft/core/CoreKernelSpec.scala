package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CoreKernelSpec extends AnyFunSuite {
  // deterministic pseudo-random samples (splitmix64) standing in for
  // property-based generators (scalacheck bridge unavailable offline)
  private def samples(n: Int): Seq[Long] =
    (1 to n).map(i => graft.images.SyntheticCorpus.mix64(0xABCDEFL + i))

  // --- bit permutation (mirrors util/bitpermutation_test.cpp:5-44) ---

  test("permute128 is a true bijection: all 128 one-hot inputs land on distinct bits") {
    val seen = scala.collection.mutable.Set.empty[(Long, Long)]
    for (i <- 0 until 128) {
      val in = if (i < 64) U128(0L, 1L << i) else U128(1L << (i - 64), 0L)
      val out = BitPermutation.permute128(in)
      assert(java.lang.Long.bitCount(out.hi) + java.lang.Long.bitCount(out.lo) === 1,
        s"one-hot input bit $i produced non-one-hot output")
      assert(seen.add((out.hi, out.lo)), s"collision at input bit $i")
    }
    assert(seen.size === 128)
  }

  test("nPermutations: zeroth is the identity, sequence is deterministic") {
    samples(50).grouped(2).foreach { case Seq(hi, lo) =>
      val p = BitPermutation.nPermutations(U128(hi, lo), 28)
      assert(p(0) === U128(hi, lo))
      val p2 = BitPermutation.nPermutations(U128(hi, lo), 28)
      assert(p.toSeq === p2.toSeq)
    }
  }

  test("U128 shifts behave as 128-bit shifts") {
    val x = U128(0x0123456789abcdefL, 0xfedcba9876543210L)
    assert((x >>> 64) === U128(0L, 0x0123456789abcdefL))
    assert((x << 64) === U128(0xfedcba9876543210L, 0L))
    assert((x >>> 4).hi === (x.hi >>> 4))
    assert(((x << 4) >>> 4).lo === x.lo) // low bits survive round trip
  }

  // --- hamming (util/util.cpp:42-47) ---

  test("hamming128 metric axioms") {
    samples(100).grouped(4).foreach { case Seq(a1, a2, b1, b2) =>
      val d = BitOps.hamming128(a1, a2, b1, b2)
      assert(d >= 0 && d <= 128)
      assert(d === BitOps.hamming128(b1, b2, a1, a2))
      assert(BitOps.hamming128(a1, a2, a1, a2) === 0)
    }
  }

  // --- hash family determinism ---

  test("seedXForHashY matches the reference derivation shape") {
    // spot values: rotl(k0, h%7)*(h+1)
    assert(HashFamily.seedXForHashY(0, 0) === HashFamily.k0)
    assert(HashFamily.seedXForHashY(1, 0) === HashFamily.k1)
    assert(HashFamily.seedXForHashY(2, 0) === HashFamily.k2)
    assert(HashFamily.seedXForHashY(0, 7) ===
      java.lang.Long.rotateLeft(HashFamily.k0, 0) * 8)
  }

  test("string/tuple/u64 hashes are deterministic and index-sensitive") {
    samples(40).foreach { i =>
      val str = s"tok_${i % 997}"
      val idx = math.abs(i % 1000)
      assert(HashFamily.stringHash(str) === HashFamily.stringHash(str))
      assert(HashFamily.hashTuple3(str, str, str, idx) ===
        HashFamily.hashTuple3(str, str, str, idx))
      assert(HashFamily.hashU64(i, idx, 0) === HashFamily.hashU64(i, idx, 0))
    }
    // different family indices give different hashes (w.h.p.)
    assert(HashFamily.hashU64(42L, 0, 0) !== HashFamily.hashU64(42L, 1, 0))
    assert(HashFamily.tuple3Hash128("a", "b", "c", 0)._1 !==
      HashFamily.tuple3Hash128("a", "b", "c", 0)._2)
  }

  // --- simhash fold (functionsimhash_test.cpp:33-95 invariants) ---

  test("zero class weights => all-ones hash and zero pairwise distance") {
    val cfg = SimHashConfig(classWeights = Vector(0.0, 0.0, 0.0))
    val f1 = Seq(U64Feat(1L), U64Feat(2L), Tuple3Feat("a", "b", "c"))
    val f2 = Seq(U64Feat(99L), Tuple3Feat("x", "y", "z"))
    val h1 = SimHash.simhash128(f1, cfg)
    val h2 = SimHash.simhash128(f2, cfg)
    assert(h1 === ((-1L, -1L)))
    assert(h2 === ((-1L, -1L)))
    assert(BitOps.hamming128(h1._1, h1._2, h2._1, h2._2) === 0)
  }

  test("empty feature set => all-ones (tie rule acc >= 0)") {
    assert(SimHash.simhash128(Nil, SimHashConfig()) === ((-1L, -1L)))
  }

  test("fold is order-independent and deterministic") {
    val feats = (1 to 50).map(i => U64Feat(i % 13)) // repeats exercise occurrence counting
    val cfg = SimHashConfig()
    val a = SimHash.simhash128(feats, cfg)
    // same multiset, same per-identity occurrence order => same hash
    val b = SimHash.simhash128(feats, cfg)
    assert(a === b)
  }

  test("occurrence indexing: k-th copy of a feature hashes differently") {
    // mirrors functionsimhash_test.cpp:12-28 (feature IDs unique per function)
    val f = U64Feat(7L)
    val h0 = f.hash128(0)
    val h1 = f.hash128(1)
    val h2 = f.hash128(2)
    assert(h0 !== h1)
    assert(h1 !== h2)
  }

  test("simhash locality: small feature perturbation => small hamming distance") {
    val base = (1 to 200).map(i => U64Feat(i.toLong)).toVector
    val cfg = SimHashConfig()
    val (h1, l1) = SimHash.simhash128(base, cfg)
    val perturbed = base.updated(0, U64Feat(9999L)).updated(100, U64Feat(8888L))
    val (h2, l2) = SimHash.simhash128(perturbed, cfg)
    val d = BitOps.hamming128(h1, l1, h2, l2)
    assert(d < 25, s"2/200 feature flips moved $d bits") // F5 default threshold
    // and unrelated sets are far apart
    val other = (1000 to 1200).map(i => U64Feat(i.toLong))
    val (h3, l3) = SimHash.simhash128(other, cfg)
    assert(BitOps.hamming128(h1, l1, h3, l3) > 40)
  }

  test("class weight 0 is equivalent to disabling the class") {
    val feats = Seq(U64Feat(1L, WeightClass.Structural),
      Tuple3Feat("a", "b", "c"), U64Feat(5L, WeightClass.Numeric))
    val zeroTok = SimHash.simhash128(feats,
      SimHashConfig(classWeights = Vector(1.0, 0.0, 4.0)))
    val disabledTok = SimHash.simhash128(feats,
      SimHashConfig(disabledClasses = Set(WeightClass.TokenNgram)))
    assert(zeroTok === disabledTok)
  }

  // --- minhash ---

  test("minhash: identical sets agree, jaccard estimate tracks exact jaccard") {
    val a = (1L to 100L).toSet
    val b = (21L to 120L).toSet // exact jaccard = 80/120 = 0.666
    val ska = MinHash.sketch(a, 128)
    val skb = MinHash.sketch(b, 128)
    assert(MinHash.estimateJaccard(ska, ska) === 1.0)
    val est = MinHash.estimateJaccard(ska, skb)
    assert(math.abs(est - 2.0 / 3.0) < 0.15, s"estimate $est far from 0.667")
  }

  test("minhash band keys: equal sketches share all bands, disjoint sets share none") {
    val ska = MinHash.sketch((1L to 50L).toSet, 64)
    val skb = MinHash.sketch((1000L to 1050L).toSet, 64)
    val ba = MinHash.bandKeys(ska, 16, 4)
    val bb = MinHash.bandKeys(skb, 16, 4)
    assert(ba.toSeq === MinHash.bandKeys(ska, 16, 4).toSeq)
    assert(ba.zip(bb).count { case (x, y) => x == y } === 0)
  }
}
