package graft.images

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Row-local image kernel: decode, luma, area resampling, 2-D DCT, 64-bit
  * pHash, multiscale pixel-block shingle descriptors, PSNR.
  *
  * This is the image analog of the reference's disassembly layer: where the
  * reference decomposes a CFG into graphlets at radius 1/2/3
  * (`flowgraphwithinstructionsfeaturegenerator.cpp:29-44`), we decompose the
  * decoded image into block-DCT descriptors at three scales. Everything here
  * is deterministic pure-JVM math — bit-identical across partitions and
  * parallelism levels.
  */
object ImageCodec {

  // the default ImageIO stream cache is a temp FILE per read/write — lock +
  // disk I/O that serializes executor threads; in-memory streams only
  ImageIO.setUseCache(false)

  def decode(bytes: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "undecodable image bytes")
    img
  }

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fmt match {
      case "jpg" =>
        val writer = ImageIO.getImageWritersByFormatName("jpg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(1.0f)
        val ios = ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        // JPEG writer requires no alpha channel
        val rgb = new BufferedImage(img.getWidth, img.getHeight,
          BufferedImage.TYPE_INT_RGB)
        rgb.getGraphics.drawImage(img, 0, 0, null)
        writer.write(null, new IIOImage(rgb, null, null), param)
        writer.dispose(); ios.close()
      case f => ImageIO.write(img, f, out)
    }
    out.toByteArray
  }

  /** BT.601 luma in [0,255]. */
  def luma(img: BufferedImage): (Array[Double], Int, Int) = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Double](w * h)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
        0.114 * (p & 0xff)
      i += 1
    }
    (out, w, h)
  }

  /** Area-average resample to tw×th (deterministic box filter). */
  def resizeArea(src: Array[Double], w: Int, h: Int, tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += src(y * w + x); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  // DCT basis matrices are shared per tile size (8/16/32) — rebuilding the
  // cosine table per call dominated the featurize profile
  private val dctBasis =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Double]]]()
  private def basis(n: Int): Array[Array[Double]] =
    dctBasis.computeIfAbsent(n, n => Array.tabulate(n, n)((k, i) =>
      math.cos(math.Pi / n * (i + 0.5) * k) *
        (if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n))))

  // Per-thread scratch: the kernel otherwise allocates ~500KB of tile/DCT
  // arrays per image, and at 32 executor threads the resulting multi-GB/s
  // allocation rate makes GC the scaling ceiling (measured: 8->32-thread
  // speedup 2.4x before, near-linear after).
  private final class Scratch {
    val tile = new Array[Double](32 * 32)
    val tmp = new Array[Double](32 * 32)
    val dctOut = new Array[Double](32 * 32)
    val resized = new Array[Double](64 * 64)
    var px = new Array[Int](128 * 128)
    var lum = new Array[Double](128 * 128)
    def ensure(n: Int): Unit = if (px.length < n) {
      px = new Array[Int](n); lum = new Array[Double](n)
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Luma into the thread-local buffer (valid until the next kernel call on
    * this thread). */
  private def lumaScratch(img: BufferedImage, sc: Scratch): (Array[Double], Int, Int) = {
    val w = img.getWidth; val h = img.getHeight
    sc.ensure(w * h)
    img.getRGB(0, 0, w, h, sc.px, 0, w)
    var i = 0
    while (i < w * h) {
      val p = sc.px(i)
      sc.lum(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
        0.114 * (p & 0xff)
      i += 1
    }
    (sc.lum, w, h)
  }

  /** Area-average resample into a caller buffer. */
  private def resizeAreaInto(src: Array[Double], w: Int, h: Int, tw: Int,
      th: Int, out: Array[Double]): Unit = {
    var ty = 0
    while (ty < th) {
      val y0 = ty * h / th; val y1 = math.max(y0 + 1, (ty + 1) * h / th)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * w / tw; val x1 = math.max(x0 + 1, (tx + 1) * w / tw)
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += src(y * w + x); x += 1 }
          y += 1
        }
        out(ty * tw + tx) = s / ((y1 - y0) * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
  }

  /** Separable orthonormal 2-D DCT-II of an n×n tile. */
  def dct2(tile: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n * n)
    dct2Into(tile, n, new Array[Double](n * n), out)
    out
  }

  /** Allocation-free DCT-II into caller-provided buffers (first n² slots). */
  private def dct2Into(tile: Array[Double], n: Int, tmp: Array[Double],
      out: Array[Double]): Unit = {
    val c = basis(n)
    var k = 0
    while (k < n) { // rows
      val ck = c(k)
      var y = 0
      while (y < n) {
        var s = 0.0; var i = 0
        while (i < n) { s += tile(y * n + i) * ck(i); i += 1 }
        tmp(y * n + k) = s
        y += 1
      }
      k += 1
    }
    k = 0
    while (k < n) { // cols
      val ck = c(k)
      var x = 0
      while (x < n) {
        var s = 0.0; var i = 0
        while (i < n) { s += tmp(i * n + x) * ck(i); i += 1 }
        out(k * n + x) = s
        x += 1
      }
      k += 1
    }
  }

  /** Classic 64-bit pHash: 32×32 luma DCT, 8×8 low-frequency block, bit i set
    * iff coefficient > median (DC excluded from the median). */
  def phash64(img: BufferedImage): Long = {
    val (l, w, h) = luma(img)
    val d = dct2(resizeArea(l, w, h, 32, 32), 32)
    val coefs = new Array[Double](64)
    var i = 0
    while (i < 64) { coefs(i) = d((i / 8) * 32 + (i % 8)); i += 1 }
    val sorted = coefs.drop(1).sorted
    val median = (sorted(30) + sorted(31)) / 2.0
    var bits = 0L
    i = 0
    while (i < 64) {
      if (coefs(i) > median) bits |= (1L << i)
      i += 1
    }
    bits
  }

  /** Multiscale block-shingle descriptors — the graphlet analog.
    *
    * The 64×64 luma is tiled at three scales (8×8 grid of 8-px blocks, 4×4 of
    * 16-px, 2×2 of 32-px — mirroring radius 1/2/3 graphlets). Each block
    * yields two packed payloads (dual offset grids for the luma band): scale,
    * grid position, deadband-ternary signs of its 8 low-frequency DCT
    * coefficients, and the quantized block luma. Both quantizers are chosen
    * so the perturbations the dup classes introduce (noise, re-encode at
    * PSNR≥40dB) flip few features, while flat-gradient distractors still
    * differ in the luma bands.
    */
  def blockShingles(img: BufferedImage): Array[Long] = {
    val sc = scratch.get()
    val (l0, w, h) = lumaScratch(img, sc)
    resizeAreaInto(l0, w, h, 64, 64, sc.resized)
    val l = sc.resized
    val out = new Array[Long](2 * (64 + 16 + 4))
    var o = 0
    var scale = 1
    while (scale <= 3) {
      val grid = 8 >> (scale - 1) // 8, 4, 2
      val bs = 64 / grid // 8, 16, 32
      var gy = 0
      while (gy < grid) {
        var gx = 0
        while (gx < grid) {
          val tile = sc.tile
          var y = 0
          while (y < bs) {
            var x = 0
            while (x < bs) {
              tile(y * bs + x) = l((gy * bs + y) * 64 + (gx * bs + x))
              x += 1
            }
            y += 1
          }
          dct2Into(tile, bs, sc.tmp, sc.dctOut)
          val d = sc.dctOut
          // deadband-ternary quantization: a coefficient within +-tau of zero
          // codes 0 stably; only coefficients near the +-tau boundary can
          // flip under small perturbations (noise <= +-2 intensity on 1% of
          // pixels moves a block coefficient by <<1 luma unit)
          val tau = 2.5
          var desc = 0L
          var bit = 0
          var u = 0
          while (u < 3) {
            var v = 0
            while (v < 3) {
              if (u != 0 || v != 0) {
                val c = d(u * bs + v)
                val code = if (c > tau) 1L else if (c < -tau) 2L else 0L
                desc |= (code << bit)
                bit += 2
              }
              v += 1
            }
            u += 1
          }
          // quantized block luma (16-luma-unit steps): smooth blocks all
          // quantize their DCT signs to 0 in the deadband, so without an
          // absolute-brightness component two flat gradients collide — a
          // measured ~2% false-merge rate on a 100k planted corpus. Emitted
          // on TWO half-step-offset grids so a small mean shift (jpg
          // re-encode moves block means <1 luma unit) crosses at most one
          // grid boundary and at least one of the two features survives.
          val m = tileMean(tile, bs * bs)
          val band0 = math.min(15L, (m / 16.0).toLong)
          val band1 = math.min(15L, ((m + 8.0) / 16.0).toLong)
          val base = (scale.toLong << 40) | (gy.toLong << 32) |
            (gx.toLong << 24) | desc
          out(o) = base | (band0 << bit)
          out(o + 1) = base | (1L << 62) | (band1 << bit)
          o += 2
          gx += 1
        }
        gy += 1
      }
      scale += 1
    }
    out
  }

  private def tileMean(t: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += t(i); i += 1 }
    s / n
  }

  /** PSNR between two images' RGB channels (for the per-row lossy-re-encode
    * invariant, BASELINE.json input_hint: PSNR ≥ 40 dB). */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight,
      "psnr: dimensions differ")
    val pa = a.getRGB(0, 0, a.getWidth, a.getHeight, null, 0, a.getWidth)
    val pb = b.getRGB(0, 0, b.getWidth, b.getHeight, null, 0, b.getWidth)
    var se = 0.0
    var i = 0
    while (i < pa.length) {
      var c = 0
      while (c < 3) {
        val d = ((pa(i) >> (8 * c)) & 0xff) - ((pb(i) >> (8 * c)) & 0xff)
        se += d.toDouble * d
        c += 1
      }
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 / (se / (pa.length * 3.0)))
  }
}
