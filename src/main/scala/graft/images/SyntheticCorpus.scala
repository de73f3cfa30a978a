package graft.images

import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One input row, shaped exactly per BASELINE.json input_hint:
  * `(image_id, bytes, w, h, fmt, caption, phash)`. */
final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
    fmt: String, caption: String, phash: Long)

final case class TruthRow(image_id: String, group_id: Long)

/** Deterministic synthetic image+caption corpus with planted duplicate
  * groups — the fixture spec of FIXTURES.md §2, mirroring the reference's
  * "same function compiled 58 ways" ground truth
  * (`testdata/ELF/unrar.5.5.3.builds`; groups keyed by symbol in
  * `testdata/generate_training_data.py`).
  *
  * Counter-based splitmix64 RNG keyed on (seed, group, stream) — no
  * wall-clock, no `scala.util.Random` state — so generation is reproducible
  * row-by-row on any executor and the corpus can be synthesized distributed
  * via `spark.range(nGroups)`.
  */
object SyntheticCorpus {
  val DefaultSeed = 0xDEADBEEFL

  /** Bump whenever `generate`'s OUTPUT changes (new variant kinds, RNG
    * stream changes, schema changes): on-disk corpus caches (OracleDump
    * .sharedCorpus, scaling corpora) are keyed by parameters + this
    * version, so a stale cache cannot silently serve old bytes. */
  val GeneratorVersion = 1

  /** splitmix64 — the standard public-domain mix (Steele et al.). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Stateless stream: value i of stream (seed, a, b). */
  final class Rng(seed: Long, a: Long, b: Long) {
    private var ctr = 0L
    def nextLong(): Long = {
      ctr += 1
      mix64(mix64(mix64(seed) ^ a) ^ (b * 0x9e3779b97f4a7c15L) ^ ctr)
    }
    def nextInt(bound: Int): Int =
      ((nextLong() >>> 1) % bound).toInt
    def nextDouble(): Double = (nextLong() >>> 11) / (1L << 53).toDouble
  }

  private val Vocab: IndexedSeq[String] =
    ("sunset beach mountain forest river city skyline portrait dog cat bird " +
      "flower macro street night vintage abstract pattern texture light shadow " +
      "red blue green golden misty frozen ancient modern tiny giant quiet busy " +
      "panorama closeup aerial underwater studio candid motion still life urban").split(" ").toIndexedSeq

  def caption(rng: Rng, n: Int): String =
    (0 until n).map(_ => Vocab(rng.nextInt(Vocab.length))).mkString(" ")

  /** Procedural base image: gradient background + random rectangles +
    * circles. Textured enough that block-DCT descriptors are informative. */
  def baseImage(rng: Rng): BufferedImage = {
    val w = 48 + rng.nextInt(49)
    val h = 48 + rng.nextInt(49)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    val c0 = rng.nextInt(0x1000000)
    val c1 = rng.nextInt(0x1000000)
    var y = 0
    while (y < h) {
      val t = y.toDouble / h
      val c = blend(c0, c1, t)
      g.setColor(new java.awt.Color(c))
      g.drawLine(0, y, w, y)
      y += 1
    }
    val shapes = 4 + rng.nextInt(6)
    var i = 0
    while (i < shapes) {
      // half-desaturated shape colors: 4:2:0 chroma subsampling in the jpg
      // variant would otherwise sink re-encode PSNR below the 40 dB invariant
      val c = rng.nextInt(0x1000000)
      val lum = ((c >> 16 & 0xff) + (c >> 8 & 0xff) + (c & 0xff)) / 3
      def mix(ch: Int) = (ch + lum) / 2
      g.setColor(new java.awt.Color(
        mix(c >> 16 & 0xff), mix(c >> 8 & 0xff), mix(c & 0xff)))
      val x0 = rng.nextInt(w); val y0 = rng.nextInt(h)
      val sw = 4 + rng.nextInt(w / 2); val sh = 4 + rng.nextInt(h / 2)
      if (rng.nextInt(2) == 0) g.fillRect(x0, y0, sw, sh)
      else g.fillOval(x0, y0, sw, sh)
      i += 1
    }
    g.dispose()
    // soften hard shape edges (two 3x3 box-blur passes): photographic-ish
    // smoothness keeps the jpg re-encode variant above the 40 dB PSNR
    // invariant and the block-DCT descriptors stable
    blur3(blur3(img))
  }

  private def blur3(img: BufferedImage): BufferedImage = {
    val w = img.getWidth; val h = img.getHeight
    val src = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val dst = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var r = 0; var gg = 0; var b = 0; var n = 0
        var dy = -1
        while (dy <= 1) {
          val yy = y + dy
          if (yy >= 0 && yy < h) {
            var dx = -1
            while (dx <= 1) {
              val xx = x + dx
              if (xx >= 0 && xx < w) {
                val p = src(yy * w + xx)
                r += (p >> 16) & 0xff; gg += (p >> 8) & 0xff; b += p & 0xff
                n += 1
              }
              dx += 1
            }
          }
          dy += 1
        }
        dst(y * w + x) = ((r / n) << 16) | ((gg / n) << 8) | (b / n)
        x += 1
      }
      y += 1
    }
    out.setRGB(0, 0, w, h, dst, 0, w)
    out
  }

  private def blend(c0: Int, c1: Int, t: Double): Int = {
    def ch(s: Int) = {
      val a = (c0 >> s) & 0xff; val b = (c1 >> s) & 0xff
      ((a + (b - a) * t).toInt & 0xff) << s
    }
    ch(16) | ch(8) | ch(0)
  }

  /** ±2-intensity noise on ~1% of pixels — PSNR stays far above 40 dB
    * (the XOR-distorted-query analog, simhashsearchindex_test.cpp:104-122). */
  def addNoise(img: BufferedImage, rng: Rng): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    out.getGraphics.drawImage(img, 0, 0, null)
    val n = math.max(1, img.getWidth * img.getHeight / 100)
    var i = 0
    while (i < n) {
      val x = rng.nextInt(img.getWidth); val y = rng.nextInt(img.getHeight)
      val p = out.getRGB(x, y)
      def jitter(v: Int) = math.min(255, math.max(0, v + rng.nextInt(5) - 2))
      out.setRGB(x, y, (jitter((p >> 16) & 0xff) << 16) |
        (jitter((p >> 8) & 0xff) << 8) | jitter(p & 0xff))
      i += 1
    }
    out
  }

  /** Swap ≤2 tokens of the caption (mnemonic-change analog,
    * functionsimhash_test.cpp:99-158). */
  def paraphrase(cap: String, rng: Rng): String = {
    val toks = cap.split(" ").toBuffer
    val swaps = 1 + rng.nextInt(2)
    var i = 0
    while (i < swaps && toks.nonEmpty) {
      toks(rng.nextInt(toks.length)) = Vocab(rng.nextInt(Vocab.length))
      i += 1
    }
    toks.mkString(" ")
  }

  /** All rows of one duplicate group (deterministic in (seed, groupId)).
    * Group layout: index 0 is the base; variants cycle through exact-dup,
    * noise, re-encode (bmp/jpg), caption paraphrase. With probability ~1/8
    * the group also plants a substring-caption row (different image, caption
    * contains the base caption verbatim) that only the suffix pass can link.
    * `variantsPerGroup = 0` yields singleton distractor groups. */
  def groupRows(seed: Long, groupId: Long, variantsPerGroup: Int,
      withSubstringRow: Boolean): Seq[(ImageRow, TruthRow)] = {
    val rng = new Rng(seed, groupId, 0L)
    val base = baseImage(rng)
    val cap = caption(rng, 8 + rng.nextInt(12))
    val rows = scala.collection.mutable.ArrayBuffer.empty[(ImageRow, TruthRow)]
    def emit(idx: Int, img: BufferedImage, fmt: String, c: String): Unit = {
      val bytes = ImageCodec.encode(img, fmt)
      val id = f"img_${groupId}%08d_$idx%02d"
      rows += ((ImageRow(id, bytes, img.getWidth, img.getHeight, fmt, c,
        ImageCodec.phash64(ImageCodec.decode(bytes))), TruthRow(id, groupId)))
    }
    emit(0, base, "png", cap)
    var v = 1
    while (v <= variantsPerGroup) {
      (v - 1) % 4 match {
        case 0 => emit(v, base, "png", cap) // exact duplicate
        case 1 => emit(v, addNoise(base, rng), "png", cap) // near-dup pixels
        case 2 => emit(v, base, if (v % 2 == 0) "jpg" else "bmp", cap) // re-encode
        case 3 => emit(v, base, "png", paraphrase(cap, rng)) // caption paraphrase
      }
      v += 1
    }
    if (withSubstringRow && variantsPerGroup > 0 && rng.nextInt(8) == 0) {
      val other = baseImage(new Rng(seed, groupId, 7L))
      val longCap = caption(rng, 3) + " " + cap + " " + caption(rng, 3)
      emit(99, other, "png", longCap)
    }
    rows.toSeq
  }

  /** Distributed corpus: `nGroups` dup groups of 1+`variantsPerGroup` rows
    * plus `nDistractors` singletons. Returns (images, truth_groups). */
  def generate(spark: SparkSession, nGroups: Int, variantsPerGroup: Int,
      nDistractors: Int, seed: Long = DefaultSeed,
      withSubstringRows: Boolean = true): (DataFrame, DataFrame) = {
    import spark.implicits._
    val groups = spark.range(0, nGroups.toLong, 1, spark.sparkContext.defaultParallelism)
      .flatMap(g => groupRows(seed, g, variantsPerGroup, withSubstringRows))
    val singles = spark.range(0, nDistractors.toLong, 1, spark.sparkContext.defaultParallelism)
      .flatMap(d => groupRows(seed, nGroups.toLong + d, 0, withSubstringRow = false))
    val all = groups.union(singles).cache()
    (all.map(_._1).toDF(), all.map(_._2).toDF())
  }
}
