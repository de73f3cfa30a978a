package graft.images

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BitOps

class ImageKernelSpec extends AnyFunSuite {
  private val rng = new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 1L, 0L)
  private lazy val base = SyntheticCorpus.baseImage(rng)

  test("png/bmp encode-decode round trip is pixel-exact; jpg is PSNR >= 40dB") {
    for (fmt <- Seq("png", "bmp")) {
      val back = ImageCodec.decode(ImageCodec.encode(base, fmt))
      assert(ImageCodec.psnr(base, back).isPosInfinity, s"$fmt not lossless")
    }
    val jpg = ImageCodec.decode(ImageCodec.encode(base, "jpg"))
    val p = ImageCodec.psnr(base, jpg)
    assert(p >= 40.0, s"jpg q95 PSNR $p < 40dB") // input_hint per-row invariant
  }

  test("noise variant stays above 40dB PSNR and caption-equal (per-row invariant)") {
    val noisy = SyntheticCorpus.addNoise(base,
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 1L, 1L))
    assert(ImageCodec.psnr(base, noisy) >= 40.0)
  }

  test("phash is deterministic and stable under near-dup transforms") {
    val h = ImageCodec.phash64(base)
    assert(h === ImageCodec.phash64(base))
    val noisy = SyntheticCorpus.addNoise(base,
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 1L, 2L))
    val jpg = ImageCodec.decode(ImageCodec.encode(base, "jpg"))
    assert(java.lang.Long.bitCount(h ^ ImageCodec.phash64(noisy)) <= 6)
    assert(java.lang.Long.bitCount(h ^ ImageCodec.phash64(jpg)) <= 6)
    // distinct images are far apart
    val other = SyntheticCorpus.baseImage(
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 999L, 0L))
    assert(java.lang.Long.bitCount(h ^ ImageCodec.phash64(other)) > 12)
  }

  test("block shingles: near-dups share almost all shingles, distinct images do not") {
    val s1 = ImageCodec.blockShingles(base).toSet
    val noisy = SyntheticCorpus.addNoise(base,
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 1L, 3L))
    val s2 = ImageCodec.blockShingles(noisy).toSet
    val shared = s1.intersect(s2).size
    assert(shared >= 76, s"noise kept only $shared/84 shingles") // >90%
    val other = ImageCodec.blockShingles(SyntheticCorpus.baseImage(
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 998L, 0L))).toSet
    assert(s1.intersect(other).size < 42, "unrelated images too similar")
  }

  test("full signature: dup variants within Hamming verify threshold, distractors outside") {
    import graft.featurize.ImageFeaturizer
    val cap = "golden sunset over the misty mountain river valley"
    val sigBase = ImageFeaturizer.signature(ImageCodec.encode(base, "png"), cap)
    val jpgSig = ImageFeaturizer.signature(ImageCodec.encode(base, "jpg"), cap)
    val d = BitOps.hamming128(sigBase.sim_hi, sigBase.sim_lo,
      jpgSig.sim_hi, jpgSig.sim_lo)
    assert(d <= 25, s"jpg re-encode drifted $d bits (> F5 threshold)")
    val other = SyntheticCorpus.baseImage(
      new SyntheticCorpus.Rng(SyntheticCorpus.DefaultSeed, 997L, 0L))
    val otherSig = ImageFeaturizer.signature(ImageCodec.encode(other, "png"),
      "quiet urban street at night with vintage lights")
    val dOther = BitOps.hamming128(sigBase.sim_hi, sigBase.sim_lo,
      otherSig.sim_hi, otherSig.sim_lo)
    assert(dOther > 25, s"unrelated pair at distance $dOther would verify")
  }

  test("group generator: per-row invariants hold for every variant") {
    val rows = SyntheticCorpus.groupRows(SyntheticCorpus.DefaultSeed, 5L, 4,
      withSubstringRow = false)
    assert(rows.size === 5)
    val baseImg = ImageCodec.decode(rows.head._1.bytes)
    rows.tail.foreach { case (r, truth) =>
      assert(truth.group_id === 5L)
      val img = ImageCodec.decode(r.bytes)
      if (img.getWidth == baseImg.getWidth && img.getHeight == baseImg.getHeight)
        assert(ImageCodec.psnr(baseImg, img) >= 40.0,
          s"variant ${r.image_id} below 40dB")
      assert(r.phash === ImageCodec.phash64(img), "phash column mismatch")
    }
  }
}
