package graft.core

/** Batched MinHash sketches over 64-bit shingle sets — the Jaccard-side
  * verifier the north rule adds next to the reference's Hamming verifier.
  *
  * The reference has no MinHash (its LSH is bit-permutation SimHash banding);
  * the construction here is the standard one-permutation-per-row k-MinHash
  * with the hash family drawn from the same seeded mixer as the SimHash
  * kernel (`HashFamily.hashU64`), so the whole engine has one deterministic
  * hash spec.
  */
object MinHash {

  /** k minimum values of `hashU64(shingle, j, 0)` over the shingle set.
    * Empty shingle set sketches to all Long.MaxValue (matches nothing but
    * itself under `estimateJaccard`). */
  def sketch(shingles: Iterable[Long], k: Int): Array[Long] = {
    val sk = Array.fill(k)(Long.MaxValue)
    val it = shingles.iterator
    while (it.hasNext) {
      val s = it.next()
      var j = 0
      while (j < k) {
        val h = HashFamily.hashU64(s, j.toLong, 0L)
        if (h < sk(j)) sk(j) = h
        j += 1
      }
      // (loop order: shingles outer so each shingle is mixed k times; k is
      // small — 64/128 — and this stays row-local and branch-predictable)
    }
    sk
  }

  /** Unbiased Jaccard estimate: fraction of agreeing sketch slots. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "sketch sizes differ")
    var eq = 0
    var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Band keys for (b bands × r rows) LSH over a sketch: one 64-bit key per
    * band, mixing the band's r slots. Two sets with Jaccard j collide in a
    * band with probability j^r. */
  def bandKeys(sk: Array[Long], bands: Int, rows: Int): Array[Long] = {
    require(bands * rows <= sk.length, s"bands*rows > sketch size ${sk.length}")
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L
      var r = 0
      while (r < rows) {
        h ^= sk(b * rows + r)
        h *= 0x100000001b3L
        r += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard of two shingle sets (verification / oracle path). */
  def exactJaccard(a: Set[Long], b: Set[Long]): Double = {
    if (a.isEmpty && b.isEmpty) 1.0
    else {
      val inter = a.intersect(b).size
      inter.toDouble / (a.size + b.size - inter)
    }
  }
}
