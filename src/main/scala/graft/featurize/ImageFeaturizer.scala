package graft.featurize

import graft.core._
import graft.images.ImageCodec

/** Everything downstream needs from one image+caption row, computed in a
  * single decode pass: the 128-bit SimHash and the caption MinHash sketch.
  * Row-local by construction — this is the Spark-side analog of the
  * reference's per-function worker lambda (`addfunctionstoindex.cpp:89-140`)
  * minus its global index mutex: on Spark each row is featurized
  * independently inside a projection and the only synchronization is the
  * band-table shuffle.
  */
final case class Signature(sim_hi: Long, sim_lo: Long, minhash: Array[Long])

/** [[Signature]] plus the fold's 128 per-bit |accumulator| margins — the
  * multi-probe flip-priority signal. TRANSIENT by contract: margins ride
  * the in-batch probe path only and are never persisted (1 KB/row of
  * state for a signal that is free to recompute at featurize time). */
final case class SignatureM(sim_hi: Long, sim_lo: Long, minhash: Array[Long],
    margins: Array[Double])

final case class FeaturizeConfig(
    simhash: SimHashConfig = SimHashConfig(),
    minhashK: Int = 64,
    captionNgram: Int = 3)

object ImageFeaturizer {

  /** Normalize a caption for tokenizing and for the substring pass:
    * lowercase, collapse whitespace runs, trim. */
  def normalizeCaption(c: String): String =
    if (c == null) "" else c.toLowerCase.split("\\s+").filter(_.nonEmpty).mkString(" ")

  def tokens(c: String): Array[String] = {
    val n = normalizeCaption(c)
    if (n.isEmpty) Array.empty else n.split(" ")
  }

  /** Caption token n-gram shingles as 64-bit hashes (MinHash input). */
  def captionShingles(c: String, n: Int): Array[Long] =
    captionShinglesOf(tokens(c), n)

  private def captionShinglesOf(t: Array[String], n: Int): Array[Long] = {
    if (t.length < n) {
      if (t.isEmpty) Array.empty
      else Array(HashFamily.stringHash(t.mkString(" ")))
    } else {
      Array.tabulate(t.length - n + 1) { i =>
        HashFamily.stringHash(t.slice(i, i + n).mkString(" "))
      }
    }
  }

  /** Salient numeric tokens of a caption — the immediate-operand analog,
    * with the reference's plausibility filter F2
    * (`flowgraphwithinstructionsfeaturegenerator.cpp:66-75`). */
  def numericTokens(c: String): Array[Long] = numericTokensOf(tokens(c))

  private def numericTokensOf(toks: Array[String]): Array[Long] =
    toks.flatMap { t =>
      if (t.nonEmpty && t.forall(_.isDigit))
        try {
          val v = java.lang.Long.parseLong(t)
          val plausible = math.abs(v) > 0x4000L || (v % 4 != 0 && v > 10)
          if (v != 0 && plausible) Some(v) else None
        } catch { case _: NumberFormatException => None }
      else None
    }

  /** Feature multiset of one row: pixel-block shingles (structural class,
    * weight 1.0), caption token 3-grams (token class, 0.05), salient numeric
    * tokens (numeric class, 4.0) — the image instantiation of the reference's
    * graphlet/mnemonic/immediate trio. */
  def features(bytes: Array[Byte], caption: String,
      cfg: FeaturizeConfig): Seq[Feat] =
    featuresOf(bytes, tokens(caption), cfg)

  private def featuresOf(bytes: Array[Byte], t: Array[String],
      cfg: FeaturizeConfig): Seq[Feat] = {
    val img = ImageCodec.decode(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[Feat]
    ImageCodec.blockShingles(img).foreach { s =>
      out += U64Feat(s, WeightClass.Structural)
    }
    var i = 0
    while (i + cfg.captionNgram <= t.length) {
      out += Tuple3Feat(t(i), t(i + 1), t(i + 2))
      i += 1
    }
    numericTokensOf(t).foreach(v => out += U64Feat(v, WeightClass.Numeric))
    out.toSeq
  }

  // tokenize ONCE per row: features (3-grams + numeric filter) and the
  // MinHash shingles all consume the same normalized token array — the
  // previous per-consumer `tokens(caption)` calls re-ran normalize+split
  // four times per record inside the hot decode projection
  def signature(bytes: Array[Byte], caption: String,
      cfg: FeaturizeConfig = FeaturizeConfig()): Signature = {
    val t = tokens(caption)
    val (hi, lo) = SimHash.simhash128(featuresOf(bytes, t, cfg), cfg.simhash)
    val sketch = MinHash.sketch(
      captionShinglesOf(t, cfg.captionNgram), cfg.minhashK)
    Signature(hi, lo, sketch)
  }

  /** [[signature]] with the fold's margins exposed (bit-identical hash —
    * same resolve + fold, spec-pinned). */
  def signatureWithMargins(bytes: Array[Byte], caption: String,
      cfg: FeaturizeConfig = FeaturizeConfig()): SignatureM = {
    val t = tokens(caption)
    val (hi, lo, m) =
      SimHash.simhash128WithMargins(featuresOf(bytes, t, cfg), cfg.simhash)
    val sketch = MinHash.sketch(
      captionShinglesOf(t, cfg.captionNgram), cfg.minhashK)
    SignatureM(hi, lo, sketch, m)
  }
}
