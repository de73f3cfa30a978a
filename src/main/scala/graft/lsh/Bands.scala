package graft.lsh

import graft.core.{BitPermutation, MinHash, U128}

/** LSH band key derivation.
  *
  * SimHash side mirrors the reference's index layout
  * (`simhashsearchindex.cpp:59-70`): band b's key is the top `prefixBits`
  * bits of the b-th iterated fixed bit-permutation of the 128-bit signature
  * (permutation 0 = identity). The reference hard-codes an 8-bit prefix
  * (`& 0xFF000...`); we keep 8 as the parity default and widen it for scale —
  * at 10^12 rows an 8-bit prefix gives 256 buckets per band, i.e. ~4·10^9
  * rows per bucket, so production config uses prefixBits 24-32 (documented in
  * the bucket-math comment of `simhashsearchindex.hpp:29-86`: more/narrower
  * buckets trade recall per band for fewer candidates; recall is recovered by
  * more bands).
  *
  * MinHash side is classic (b bands × r rows) banding over the caption
  * sketch; its band ids are offset by 1000 so both families share one bands
  * table and one candidate self-join.
  */
object Bands {
  final val MinhashBandOffset = 1000

  /** (band_id, band_key) pairs for the simhash signature. */
  def simhashBands(simHi: Long, simLo: Long, nBands: Int,
      prefixBits: Int): Array[(Int, Long)] = {
    val perms = BitPermutation.nPermutations(U128(simHi, simLo), nBands)
    Array.tabulate(nBands)(b => (b, perms(b).hi >>> (64 - prefixBits)))
  }

  /** (band_id, band_key) pairs for the minhash sketch. */
  def minhashBands(sketch: Array[Long], nBands: Int,
      rowsPerBand: Int): Array[(Int, Long)] = {
    val keys = MinHash.bandKeys(sketch, nBands, rowsPerBand)
    Array.tabulate(nBands)(b => (MinhashBandOffset + b, keys(b)))
  }
}
