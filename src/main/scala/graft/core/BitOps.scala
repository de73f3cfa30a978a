package graft.core

/** Pure 64/128-bit primitives shared by the SimHash kernel and the LSH layer.
  *
  * Semantics mirror the reference engine's utility layer
  * (`/root/reference/util/util.cpp:42-47` HammingDistance,
  * `/root/reference/util/bitpermutation.hpp:20-33` u128 pack/unpack) but are
  * written from scratch for the JVM: a 128-bit value is a pair of signed
  * longs `(hi, lo)` whose bit patterns are treated as unsigned.
  */
object BitOps {
  @inline def rotl64(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  /** Hamming distance between two 128-bit values given as (hi, lo) pairs.
    * Reference: `util/util.cpp:42-47` — popcount(aHi^bHi)+popcount(aLo^bLo).
    */
  @inline def hamming128(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Int =
    java.lang.Long.bitCount(aHi ^ bHi) + java.lang.Long.bitCount(aLo ^ bLo)

  /** Similarity as reported by the reference: 128 - hamming
    * (`searchbackend/simhashsearchindex.cpp:129-131`). */
  @inline def similarity128(aHi: Long, aLo: Long, bHi: Long, bLo: Long): Int =
    128 - hamming128(aHi, aLo, bHi, bLo)
}

/** Immutable 128-bit unsigned integer as two longs. `hi` holds bits 64..127.
  * Only the operations the bit-permutation needs are implemented.
  */
final case class U128(hi: Long, lo: Long) {
  def ^(o: U128): U128 = U128(hi ^ o.hi, lo ^ o.lo)
  def &(o: U128): U128 = U128(hi & o.hi, lo & o.lo)

  /** Logical (unsigned) right shift by 0 <= s <= 127. */
  def >>>(s: Int): U128 =
    if (s == 0) this
    else if (s < 64) U128(hi >>> s, (lo >>> s) | (hi << (64 - s)))
    else if (s == 64) U128(0L, hi)
    else U128(0L, hi >>> (s - 64))

  /** Left shift by 0 <= s <= 127. */
  def <<(s: Int): U128 =
    if (s == 0) this
    else if (s < 64) U128((hi << s) | (lo >>> (64 - s)), lo << s)
    else if (s == 64) U128(lo, 0L)
    else U128(lo << (s - 64), 0L)
}
