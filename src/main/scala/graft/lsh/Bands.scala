package graft.lsh

import graft.core.{BitPermutation, MinHash, U128}

/** One LSH band row: `band_id` names the band (permutation index, or
  * 1000+minhash band), `band_key` is the shuffle/partition bucket (top
  * `prefixBits` of the band value), and `sort_hi/sort_lo` carry the FULL
  * band value for sorted-neighbor candidate generation within the bucket. */
final case class BandRow(band_id: Int, band_key: Long, sort_hi: Long, sort_lo: Long)

/** LSH band derivation.
  *
  * SimHash side mirrors the reference's index layout
  * (`simhashsearchindex.cpp:59-70`): band b's value is the b-th iterated
  * fixed bit-permutation of the 128-bit signature (permutation 0 = identity)
  * and the bucket key is its top `prefixBits` bits (the reference masks 8).
  *
  * Candidate generation does NOT cross-product the bucket (the reference can,
  * because it answers one query against an index; an all-pairs self-join
  * would be O(bucket²) and explodes past ~10^5 rows). Instead the full band
  * value is carried so the dedup pipeline can sort the bucket by it and
  * compare each row only to its next-W sorted neighbors — the sorted-
  * fingerprint scheme of Manku et al. (WWW'07), which is linear in N and
  * turns degenerate identical-signature runs into CC-linked chains instead
  * of quadratic pair sets. `prefixBits` only bounds the per-window-partition
  * sort size; widen it at cluster scale (north rule: range-partitioned
  * signature shuffles).
  *
  * MinHash side is classic (b bands × r rows) banding over the caption
  * sketch; band ids offset by 1000 so both families share one bands table
  * and one candidate pass.
  */
object Bands {
  final val MinhashBandOffset = 1000

  def simhashBands(simHi: Long, simLo: Long, nBands: Int,
      prefixBits: Int): Array[BandRow] = {
    val perms = BitPermutation.nPermutations(U128(simHi, simLo), nBands)
    Array.tabulate(nBands) { b =>
      BandRow(b, perms(b).hi >>> (64 - prefixBits), perms(b).hi, perms(b).lo)
    }
  }

  /** For band `b` and bucket-key bit `j` (bit j of `band_key`, i.e. hi bit
    * `64 - prefixBits + j` of the b-th iterated permutation), the index
    * into the fold's MARGIN array (`SimHash.simhash128WithMargins` layout:
    * < 64 = hi bit, 64+i = lo bit) of the SOURCE signature bit that lands
    * there. Computed once per (nBands, prefixBits) by pushing one-hot
    * basis vectors through the iterated butterfly permutation; cached. */
  private val keyBitSourceCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Array[Int]]]

  private[graft] def keyBitMarginSources(nBands: Int,
      prefixBits: Int): Array[Array[Int]] =
    keyBitSourceCache.getOrElseUpdate((nBands, prefixBits), {
      // u128 position convention: p < 64 = lo bit p, p >= 64 = hi bit p-64
      def oneHot(p: Int): U128 =
        if (p < 64) U128(0L, 1L << p) else U128(1L << (p - 64), 0L)
      def posOf(u: U128): Int =
        if (u.lo != 0L) java.lang.Long.numberOfTrailingZeros(u.lo)
        else 64 + java.lang.Long.numberOfTrailingZeros(u.hi)
      var basis = Array.tabulate(128)(oneHot) // basis(srcPos) after b perms
      val out = Array.ofDim[Int](nBands, prefixBits)
      var b = 0
      while (b < nBands) {
        if (b > 0) basis = basis.map(BitPermutation.permute128)
        val srcOfPos = new Array[Int](128)
        var s = 0
        while (s < 128) { srcOfPos(posOf(basis(s))) = s; s += 1 }
        var j = 0
        while (j < prefixBits) {
          // band_key bit j = hi bit (64 - prefixBits + j) = u128 pos
          // 128 - prefixBits + j; convert the source POSITION to the
          // margin-array index (hi bit k -> k, lo bit k -> 64 + k)
          val srcPos = srcOfPos(128 - prefixBits + j)
          out(b)(j) = if (srcPos >= 64) srcPos - 64 else 64 + srcPos
          j += 1
        }
        b += 1
      }
      out
    })

  /** Query-side multi-probe rows for the permuted-band SimHash index: per
    * band, `extraProbes` additional rows, each flipping ONE of the band
    * key's lowest-margin bits (margins from the query's own fold — Lv et
    * al.'s flip priority; ties break by bit index, fully deterministic).
    * The exact rows are NOT included — callers union these with
    * [[simhashBands]]' output. Probing is query-side only: the persisted
    * index stores exact keys, so `nBands` can shrink several-fold at equal
    * retrieval recall — at 10^12 rows the persisted band volume, not the
    * per-query join fan-out, dominates cost. `sort_hi` carries the same
    * flip so probe rows sort adjacent to the probed bucket's true members
    * in the sorted-neighbor candidate pass. */
  def simhashProbeBands(simHi: Long, simLo: Long, margins: Array[Double],
      nBands: Int, prefixBits: Int, extraProbes: Int): Array[BandRow] = {
    require(extraProbes >= 0 && extraProbes <= prefixBits,
      s"extraProbes $extraProbes must be in [0, prefixBits=$prefixBits]")
    require(margins.length == 128, s"margins must have 128 entries")
    val perms = BitPermutation.nPermutations(U128(simHi, simLo), nBands)
    val srcs = keyBitMarginSources(nBands, prefixBits)
    val out = new Array[BandRow](nBands * extraProbes)
    val order = new Array[Int](prefixBits)
    var o = 0
    var b = 0
    while (b < nBands) {
      val key = perms(b).hi >>> (64 - prefixBits)
      var i = 0
      while (i < prefixBits) { order(i) = i; i += 1 }
      // partial selection sort: the extraProbes lowest-margin key bits
      var e = 0
      while (e < extraProbes) {
        var m = e
        var j = e + 1
        while (j < prefixBits) {
          val oj = order(j); val om = order(m)
          val mj = margins(srcs(b)(oj)); val mm = margins(srcs(b)(om))
          if (mj < mm || (mj == mm && oj < om)) m = j
          j += 1
        }
        val t = order(e); order(e) = order(m); order(m) = t
        val fj = order(e)
        out(o) = BandRow(b, key ^ (1L << fj),
          perms(b).hi ^ (1L << (64 - prefixBits + fj)), perms(b).lo)
        o += 1
        e += 1
      }
      b += 1
    }
    out
  }

  def minhashBands(sketch: Array[Long], nBands: Int, rowsPerBand: Int,
      prefixBits: Int): Array[BandRow] = {
    // an EMPTY shingle set sketches to all-MaxValue slots — identical for
    // every empty input, so banding it would collide every captionless
    // record with every other (estimated Jaccard 1.0 between empty sets)
    // and silently merge them all into one cluster. No shingles = no
    // caption evidence = no minhash candidates; such records can still
    // pair via the pixel-SimHash bands.
    if (sketch.length == 0 || sketch.forall(_ == Long.MaxValue))
      return Array.empty
    val keys = MinHash.bandKeys(sketch, nBands, rowsPerBand)
    Array.tabulate(nBands) { b =>
      BandRow(MinhashBandOffset + b, keys(b) >>> (64 - prefixBits), keys(b), 0L)
    }
  }
}
