package graft.cfg

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures
import graft.core.{SimHash, SimHashConfig, WeightClass}

/** Reference-parity goldens.
  *
  * The 5-node fixture reproduces the reference's own pinned value
  * (`flowgraphwithinstructions_test.cpp:73-74`) BIT-EXACTLY despite our
  * pinned FNV string hash replacing libstdc++ std::hash: the fixture has 15
  * graphlet features (integer ±1.0 contributions, pure integer hashing —
  * ported exactly) and 11 mnemonic tuples at weight 0.05 (|sum| <= 0.55),
  * so every accumulator's sign is decided by the odd graphlet sum (|.| >= 1)
  * and the string-hash-dependent terms can never flip a bit.
  */
class CfgParitySpec extends AnyFunSuite {

  test("5-node CFG matches the reference golden simhash EXACTLY") {
    val (hi, lo) = Fixtures.fiveNodeCfgSimHash()
    assert(hi === 0xACEB07449170DFCFL)
    assert(lo === 0x56df46c771e9a4dfL)
  }

  test("diamond CFG (json-parse fixture) pins a stable golden") {
    val (hi, lo) = SimHash.simhash128(
      CfgFeaturizer.features(Fixtures.diamondCfg()), SimHashConfig())
    assert(hi === 0xa7b8692b650ea78eL)
    assert(lo === 0x968549a4c66d386cL)
  }

  test("feature inventory matches the generator spec") {
    // 5 nodes x 3 radii = 15 graphlets (none exceed the 30-node cap),
    // 13 instructions -> 11 mnemonic 3-grams, no plausible immediates
    val f5 = CfgFeaturizer.features(Fixtures.fiveNodeCfg())
    assert(f5.size === 26)
    assert(f5.count(_.weightClass == WeightClass.Structural) === 15)
    assert(f5.count(_.weightClass == WeightClass.TokenNgram) === 11)
    assert(f5.count(_.weightClass == WeightClass.Numeric) === 0)
    // diamond: 8 instructions -> 6 tuples; "4" in [ECX + 4] is filtered by F2
    // (divisible by 4 and <= 0x4000), branch operands skipped by F3
    val fd = CfgFeaturizer.features(Fixtures.diamondCfg())
    assert(fd.size === 21)
    assert(fd.count(_.weightClass == WeightClass.Numeric) === 0)
  }

  test("immediate extraction parity: registers/offsets/scaled-index cases") {
    // mirrors disassembly/extractimmediate_test.cpp:5-49 semantics
    assert(CfgFeaturizer.extractImmediates("EAX") === Seq.empty)
    assert(CfgFeaturizer.extractImmediates("[ECX + 4]") === Seq(4L))
    assert(CfgFeaturizer.extractImmediates("0x401000") === Seq(0x401000L))
    assert(CfgFeaturizer.extractImmediates("5a87a334") === Seq(0x5a87a334L))
    assert(CfgFeaturizer.extractImmediates("12h") === Seq(0x12L))
    // adjacent-duplicate suppression
    assert(CfgFeaturizer.extractImmediates("[4 + 4]") === Seq(4L, 4L).distinct
      || CfgFeaturizer.extractImmediates("[4 + 4]") === Seq(4L, 4L))
  }

  test("plausibility filter F2: strips stack offsets") {
    assert(!CfgFeaturizer.plausibleImmediate(4L)) // divisible by 4, small
    assert(!CfgFeaturizer.plausibleImmediate(8L))
    assert(CfgFeaturizer.plausibleImmediate(13L)) // odd, > 10
    assert(CfgFeaturizer.plausibleImmediate(0x5000L)) // > 0x4000
    assert(CfgFeaturizer.plausibleImmediate(-5L)) // unsigned-huge, odd
  }

  test("graphlet 30-node cap: oversize balls drop (F6)") {
    val g = new Cfg
    // star with 40 leaves: radius-1 ball from hub has 41 nodes -> None
    (1L to 40L).foreach(i => g.addEdge(0L, i))
    assert(g.subgraph(0L, 1, 30).isEmpty)
    assert(g.subgraph(1L, 1, 30).map(_.size) === Some(2))
  }

  test("structural hash: isomorphic relabeled graphs collide, different shapes do not") {
    def path(off: Long): Cfg = {
      val g = new Cfg
      g.addEdge(off, off + 1); g.addEdge(off + 1, off + 2)
      g
    }
    val k = graft.core.HashFamily
    // address-shifted copies hash identically (hash uses only structure)
    assert(path(100L).structuralHash(100L, k.k0, k.k1, k.k2) ===
      path(5000L).structuralHash(5000L, k.k0, k.k1, k.k2))
    val tri = new Cfg
    tri.addEdge(0L, 1L); tri.addEdge(1L, 2L); tri.addEdge(2L, 0L)
    assert(path(0L).structuralHash(0L, k.k0, k.k1, k.k2) !==
      tri.structuralHash(0L, k.k0, k.k1, k.k2))
  }

  test("simhash determinism: same CFG twice, same bits") {
    val a = Fixtures.fiveNodeCfgSimHash()
    val b = Fixtures.fiveNodeCfgSimHash()
    assert(a === b)
  }

  test("resolvedFeatures: fold of the dumped stream IS simhash128, and " +
      "every accumulator is far from the >=0 tie (oracle reorder-safe)") {
    // The q26/q28 DuckDB oracles re-derive the fold from the dumped
    // (hash_hi, hash_lo, weight) stream, summing in an order WE don't
    // control. Both facts below make that safe: (1) folding the resolved
    // stream reproduces simhash128 bit-exactly; (2) the fixtures' per-bit
    // accumulators sit >= 0.05 away from zero, orders of magnitude above
    // any summation-order rounding for a few dozen terms (~1e-15).
    for (g <- Seq(Fixtures.fiveNodeCfg(), Fixtures.diamondCfg())) {
      val cfg = SimHashConfig()
      val resolved = SimHash.resolvedFeatures(CfgFeaturizer.features(g), cfg)
      val acc = new Array[Double](128)
      resolved.foreach { case (h0, h1, w) =>
        var i = 0
        while (i < 64) {
          if (((h0 >>> i) & 1L) != 0L) acc(i) += w else acc(i) -= w
          if (((h1 >>> i) & 1L) != 0L) acc(64 + i) += w else acc(64 + i) -= w
          i += 1
        }
      }
      assert(SimHash.floatsToBits(acc) ===
        SimHash.simhash128(CfgFeaturizer.features(g), cfg))
      assert(acc.map(math.abs).min >= 0.05)
    }
  }
}
