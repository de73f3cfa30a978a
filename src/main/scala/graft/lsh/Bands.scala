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
