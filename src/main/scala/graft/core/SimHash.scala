package graft.core

import scala.collection.mutable

/** Weight classes, mirroring the reference's three feature families and their
  * untrained default weights (`functionsimhash.hpp:109-111`):
  * structural (graphlet, 1.0), token n-gram (mnemonic, 0.05),
  * numeric (immediate, 4.0).
  */
object WeightClass {
  val Structural = 0
  val TokenNgram = 1
  val Numeric = 2
}

/** SimHash kernel configuration — mirror of the reference's `FeatureOptions`
  * + default class weights (`functionsimhash.hpp:36-46,109-111`).
  *
  * @param classWeights default weight per WeightClass index
  * @param weights per-feature override map keyed by the feature's
  *        occurrence-indexed 64-bit id (`functionsimhash.cpp:153`)
  * @param disabledClasses weight-class ids whose features are skipped
  */
final case class SimHashConfig(
    classWeights: Vector[Double] = Vector(1.0, 0.05, 4.0),
    weights: Map[Long, Double] = Map.empty,
    disabledClasses: Set[Int] = Set.empty
)

/** A feature to be folded into a SimHash: a member of the seeded hash family.
  * `hash128(i)` is the i-th family member's 128 bits for this feature;
  * occurrence-indexed ids are `hash128(occ)._1` (see
  * `GetMnemonicIdOccurrence`/`GetImmediateIdOccurrence`/
  * `GetGraphletIdOccurrence`, `functionsimhash.cpp:346-391`).
  */
trait Feat {
  def weightClass: Int
  def hash128(hashIndex: Long): (Long, Long)
}

final case class Tuple3Feat(a: String, b: String, c: String,
    weightClass: Int = WeightClass.TokenNgram) extends Feat {
  def hash128(hashIndex: Long): (Long, Long) =
    HashFamily.tuple3Hash128(a, b, c, hashIndex)
}

final case class U64Feat(payload: Long,
    weightClass: Int = WeightClass.Numeric) extends Feat {
  def hash128(hashIndex: Long): (Long, Long) =
    HashFamily.u64Hash128(payload, hashIndex)
}

/** The SimHash fold — the reference's one true aggregate
  * (`CalculateFunctionSimHash`, `functionsimhash.cpp:72-143`).
  *
  * Row-local by design: features of one record never cross a partition
  * boundary, so on Spark this runs as a scalar typed UDF inside whole-stage
  * codegen'd projections — no shuffle, no UDAF.
  */
object SimHash {

  /** Fold a record's feature multiset into a 128-bit SimHash `(hi, lo)`.
    *
    * Multiset semantics: the k-th occurrence of an identical feature is
    * hashed with family index k, so repeats enrich rather than dominate the
    * hash (`feature_cardinalities`, `functionsimhash.cpp:85-139`). Identity
    * is the occurrence-0 id; the occurrence-indexed id keys the trained
    * weight override.
    *
    * Tie rule: accumulator `>= 0` sets the bit (`FloatsToBits`,
    * `functionsimhash.cpp:39-52`) — all-zero weights yield the all-ones hash.
    */
  def simhash128(features: Iterable[Feat], cfg: SimHashConfig): (Long, Long) = {
    val acc = new Array[Double](128)
    resolveFeatures(features, cfg)(new ResolvedConsumer {
      def accept(h0: Long, h1: Long, w: Double): Unit =
        addWeights(h0, h1, w, acc)
    })
    floatsToBits(acc)
  }

  /** [[simhash128]] plus the per-bit |accumulator| margins — the
    * flip-priority signal for multi-probe LSH (Lv et al., VLDB'07, applied
    * to the permuted-band index): the smaller |acc| at a bit, the likelier
    * that bit landed on the wrong side of the fold for a true
    * near-neighbor, so query-side probes flip lowest-margin bits first.
    * Margin indexing matches the accumulator layout ([[floatsToBits]]):
    * index i < 64 is hi bit i, index 64+i is lo bit i. */
  def simhash128WithMargins(features: Iterable[Feat],
      cfg: SimHashConfig): (Long, Long, Array[Double]) = {
    val acc = new Array[Double](128)
    resolveFeatures(features, cfg)(new ResolvedConsumer {
      def accept(h0: Long, h1: Long, w: Double): Unit =
        addWeights(h0, h1, w, acc)
    })
    val (hi, lo) = floatsToBits(acc)
    var i = 0
    while (i < 128) { acc(i) = math.abs(acc(i)); i += 1 }
    (hi, lo, acc)
  }

  /** Unboxed sink for the resolved feature stream — a dedicated trait
    * (not `Function3`, which boxes all three primitive args) so the hot
    * per-record fold in [[simhash128]] allocates nothing per feature. */
  trait ResolvedConsumer { def accept(h0: Long, h1: Long, w: Double): Unit }

  /** The occurrence/weight-resolution half of [[simhash128]]: streams each
    * resolved `(hash_hi, hash_lo, weight)` into `out`. `simhash128` folds
    * exactly this stream, so the dumped oracle evidence and the engine
    * cannot drift. */
  def resolveFeatures(features: Iterable[Feat], cfg: SimHashConfig)(
      out: ResolvedConsumer): Unit = {
    val cardinalities = mutable.HashMap.empty[Long, Long]
    val it = features.iterator
    while (it.hasNext) {
      val f = it.next()
      if (!cfg.disabledClasses.contains(f.weightClass)) {
        val id0 = f.hash128(0)._1
        val occ = cardinalities.getOrElse(id0, 0L)
        cardinalities.update(id0, occ + 1)
        val (h0, h1) = if (occ == 0) f.hash128(0) else f.hash128(occ)
        val w = cfg.weights.getOrElse(h0, cfg.classWeights(f.weightClass))
        out.accept(h0, h1, w)
      }
    }
  }

  /** [[resolveFeatures]] materialized as a Seq — the oracle-evidence dump
    * form (q26/q28): the fold below it (per-bit ±w accumulate, `>= 0` tie
    * rule, hex packing) is pure arithmetic a SQL engine can re-derive from
    * this table, which turns the "kernel fixture" queries into
    * relationally checked ones. */
  def resolvedFeatures(features: Iterable[Feat],
      cfg: SimHashConfig): Seq[(Long, Long, Double)] = {
    val out = Seq.newBuilder[(Long, Long, Double)]
    resolveFeatures(features, cfg)(new ResolvedConsumer {
      def accept(h0: Long, h1: Long, w: Double): Unit = out += ((h0, h1, w))
    })
    out.result()
  }

  /** Fold precomputed 128-bit feature hashes with a weight map — the
    * trained-weights entry point (`functionsimhash.cpp:145-163`: default
    * weight 1.0, override keyed by the hash's first word). */
  def simhashOfHashes(hashes: Iterable[(Long, Long)],
      weights: Map[Long, Double]): (Long, Long) = {
    val acc = new Array[Double](128)
    hashes.foreach { case (h0, h1) =>
      addWeights(h0, h1, weights.getOrElse(h0, 1.0), acc)
    }
    floatsToBits(acc)
  }

  /** `AddWeightsInHashToOutput` (`functionsimhash.cpp:235-246`): bit set adds
    * +w, bit clear adds -w, bit i of the 128-bit hash = word i/64, bit i%64. */
  @inline private def addWeights(h0: Long, h1: Long, w: Double,
      acc: Array[Double]): Unit = {
    var i = 0
    while (i < 64) {
      if (((h0 >>> i) & 1L) != 0L) acc(i) += w else acc(i) -= w
      if (((h1 >>> i) & 1L) != 0L) acc(64 + i) += w else acc(64 + i) -= w
      i += 1
    }
  }

  /** `FloatsToBits` with the `>= 0 -> 1` tie rule (`functionsimhash.cpp:46`). */
  def floatsToBits(acc: Array[Double]): (Long, Long) = {
    var hi = 0L
    var lo = 0L
    var i = 0
    while (i < 64) {
      if (acc(i) >= 0) hi |= (1L << i)
      if (acc(64 + i) >= 0) lo |= (1L << i)
      i += 1
    }
    (hi, lo)
  }
}
