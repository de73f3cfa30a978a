package graft.core

import BitOps.rotl64

/** The seeded hash family the SimHash kernel draws its per-feature bits from.
  *
  * Semantics follow the reference's family construction
  * (`/root/reference/searchbackend/functionsimhash.cpp:250-335`):
  *  - three CityHash prime seeds (`functionsimhash.hpp:226-229`);
  *  - `seedXForHashY` derives the i-th family member's seeds;
  *  - 64-bit member hashes are extended to 128 bits by bumping the counter /
  *    hash index for the second word (`functionsimhash.cpp:304-335`).
  *
  * One deliberate deviation (SURVEY.md §2.9 C6): the reference hashes strings
  * with `std::hash<std::string>` — implementation-defined and therefore not a
  * portable spec. We pin FNV-1a 64 over UTF-8 bytes instead; every test golden
  * in this repo is derived from THIS spec, and "same config" parity means
  * same-family + same-fold semantics, not libstdc++ bit-equality.
  */
object HashFamily {
  /** CityHash primes, as in `functionsimhash.hpp:226-229`. */
  val k0: Long = 0xc3a5c85c97cb3127L
  val k1: Long = 0xb492b66fbe98f273L
  val k2: Long = 0x9ae16a3b2f90404fL

  /** `SeedXForHashY` — `functionsimhash.cpp:250-261`. */
  def seedXForHashY(seedIndex: Int, hashIndex: Long): Long = seedIndex match {
    case 0 => rotl64(k0, (hashIndex % 7).toInt) * (hashIndex + 1)
    case 1 => rotl64(k1, (hashIndex % 11).toInt) * (hashIndex + 1)
    case 2 => rotl64(k2, (hashIndex % 13).toInt) * (hashIndex + 1)
    case _ => throw new IllegalArgumentException(s"seed index $seedIndex > 2")
  }

  /** Pinned 64-bit string hash (FNV-1a over UTF-8), replacing the
    * implementation-defined `std::hash<std::string>` of the reference. */
  def stringHash(s: String): Long = {
    var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L // FNV-1a 64 prime
      i += 1
    }
    h
  }

  /** Hash a 3-tuple of tokens — `HashMnemTuple`, `functionsimhash.cpp:264-276`. */
  def hashTuple3(a: String, b: String, c: String, hashIndex: Long): Long = {
    var v = seedXForHashY(0, hashIndex) ^ seedXForHashY(1, hashIndex) ^
      seedXForHashY(2, hashIndex)
    v *= stringHash(a); v = rotl64(v, 7)
    v *= stringHash(b); v = rotl64(v, 7)
    v *= stringHash(c); v = rotl64(v, 7)
    v *= (k2 * (hashIndex + 1))
    v
  }

  /** Hash an arbitrary 64-bit payload — `HashImmediate`,
    * `functionsimhash.cpp:289-311`. Also used for our image pixel-block
    * shingles (the payload is the packed block descriptor). */
  def hashU64(payload: Long, hashIndex: Long, counter: Long): Long = {
    var v = seedXForHashY(0, hashIndex) + counter * k0 + counter * k1 +
      counter * k2
    v = rotl64(v, 7)
    v *= (payload ^ seedXForHashY(0, hashIndex)); v = rotl64(v, 7)
    v *= (payload ^ seedXForHashY(1, hashIndex)); v = rotl64(v, 7)
    v *= (payload ^ seedXForHashY(2, hashIndex)); v = rotl64(v, 7)
    v *= ((k2 ^ payload) * (hashIndex + 1))
    v
  }

  /** 128-bit tuple-feature hash: word k at `hashIndex + 64k + 1`
    * (`CalculateNBitMnemTupleHash`, `functionsimhash.cpp:328-335`). */
  def tuple3Hash128(a: String, b: String, c: String, hashIndex: Long): (Long, Long) =
    (hashTuple3(a, b, c, hashIndex + 1), hashTuple3(a, b, c, hashIndex + 65))

  /** 128-bit u64-payload hash: word k at counter 64k
    * (`CalculateNBitImmediateHash`, `functionsimhash.cpp:304-311`). */
  def u64Hash128(payload: Long, hashIndex: Long): (Long, Long) =
    (hashU64(payload, hashIndex, 0), hashU64(payload, hashIndex, 64))
}
