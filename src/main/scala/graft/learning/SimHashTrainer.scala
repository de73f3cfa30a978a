package graft.learning

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.images.SyntheticCorpus.mix64

/** One resolved training pair: the feature-id lists of both records and the
  * label. The loss term touches the UNION of both lists' weights — the
  * reference's U1 (`SimHashTrainer::AddPairLossTerm`,
  * `learning/simhashtrainer.cpp:39-61`). */
final case class TrainPair(aFeats: Array[Int], bFeats: Array[Int],
    attract: Boolean)

/** Supervised per-feature SimHash weight training — the Spark port of the
  * reference's headline differentiator (`learning/simhashtrainer.cpp:89-158`,
  * loss `learning/simhashweightslossfunctor.hpp:66-239`, solver
  * `learning/sgdsolver.cpp:17-108`).
  *
  * The loss is the reference's exactly: per pair, per SimHash bit i, with
  * x_i = Σ_{f∈A} w_f·s_i(f) and y_i = Σ_{f∈B} w_f·s_i(f) (s_i(f) = ±1 from
  * bit i of the feature hash; x negated for repulsion pairs):
  *
  *   g = 1 − xy/√((xy)²+1)         (smoothed sign-disagreement step)
  *   d = √((x−y)²+0.1)             (smoothed |x−y|)
  *   loss_i = g·√(d+0.01),  pair loss = Σ_i loss_i / (set_size/64)
  *
  * The gradient is closed-form (the reference uses reverse-mode autodiff;
  * the expression is simple enough to differentiate by hand — see
  * `lossAndGrad`). Distribution shape, per SURVEY §3.3: one pass over the
  * pair table emits (feature_id, ∂L/∂w) contributions, aggregated with
  * `groupBy(feature_id).sum` — the weight vector stays bounded by the
  * distinct-feature count, the pair volume is what scales out. Pair sets
  * that fit the driver short-circuit to a local loop (identical kernel),
  * since a Spark job per line-search probe would be all scheduling.
  *
  * Solver mirrors `SGDSolver::solve`: steepest descent, per-iteration step
  * `10·(1/‖∇‖∞)·(1/(iter+1))` with a ÷100 backoff line search, stop on
  * loss < 1, exhausted backoff, or an exponentially-weighted average gain
  * below 1e-20. Weight init is 1.0 + deterministic jitter (splitmix64 in
  * place of the reference's `N(0, 0.01)` — reproducible across runs).
  */
object SimHashTrainer {

  /** Per-pair loss and gradient accumulation. `grad` is indexed by feature
    * id and ACCUMULATED into (scaled by `invNorm` = 1/(set_size/64)). */
  def lossAndGrad(pair: TrainPair, hiBits: Array[Long], loBits: Array[Long],
      w: Array[Double], invNorm: Double, grad: Array[Double]): Double = {
    val x = new Array[Double](128)
    val y = new Array[Double](128)
    var k = 0
    while (k < pair.aFeats.length) {
      val f = pair.aFeats(k); val wf = w(f)
      addSigned(hiBits(f), loBits(f), wf, x)
      k += 1
    }
    k = 0
    while (k < pair.bFeats.length) {
      val f = pair.bFeats(k); val wf = w(f)
      addSigned(hiBits(f), loBits(f), wf, y)
      k += 1
    }
    val sign = if (pair.attract) 1.0 else -1.0
    var loss = 0.0
    val dLdx = new Array[Double](128)
    val dLdy = new Array[Double](128)
    var i = 0
    while (i < 128) {
      val xi = sign * x(i); val yi = y(i)
      val u = xi * yi
      val su = math.sqrt(u * u + 1.0)
      val g = 1.0 - u / su
      val dgdu = -1.0 / (su * su * su)
      val dd = xi - yi
      val d = math.sqrt(dd * dd + 0.1)
      val q = math.sqrt(d + 0.01)
      loss += g * q
      val dqdd = g / (2.0 * q) * (dd / d)
      // ∂loss/∂x̃ then chain through the repulsion sign flip
      dLdx(i) = (dgdu * yi * q + dqdd) * sign * invNorm
      dLdy(i) = (dgdu * xi * q - dqdd) * invNorm
      i += 1
    }
    k = 0
    while (k < pair.aFeats.length) {
      val f = pair.aFeats(k)
      grad(f) += dotSigned(hiBits(f), loBits(f), dLdx)
      k += 1
    }
    k = 0
    while (k < pair.bFeats.length) {
      val f = pair.bFeats(k)
      grad(f) += dotSigned(hiBits(f), loBits(f), dLdy)
      k += 1
    }
    loss * invNorm
  }

  @inline private def addSigned(hi: Long, lo: Long, w: Double,
      acc: Array[Double]): Unit = {
    var i = 0
    while (i < 64) {
      if (((hi >>> i) & 1L) != 0L) acc(i) += w else acc(i) -= w
      if (((lo >>> i) & 1L) != 0L) acc(64 + i) += w else acc(64 + i) -= w
      i += 1
    }
  }

  @inline private def dotSigned(hi: Long, lo: Long,
      v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < 64) {
      s += (if (((hi >>> i) & 1L) != 0L) v(i) else -v(i))
      s += (if (((lo >>> i) & 1L) != 0L) v(64 + i) else -v(64 + i))
      i += 1
    }
    s
  }

  /** Full-set loss + gradient: local loop when the pair set fits the
    * driver, otherwise a distributed pass with `groupBy(id).sum` —
    * same kernel either way. */
  def evaluate(spark: SparkSession, pairs: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], w: Array[Double],
      nAttract: Long, nRepulse: Long): (Double, Array[Double]) = {
    val invA = if (nAttract > 0) 64.0 / nAttract else 0.0
    val invR = if (nRepulse > 0) 64.0 / nRepulse else 0.0
    pairs match {
      case Left(local) =>
        val grad = new Array[Double](w.length)
        var loss = 0.0
        var i = 0
        while (i < local.length) {
          val p = local(i)
          loss += lossAndGrad(p, hiBits, loBits, w,
            if (p.attract) invA else invR, grad)
          i += 1
        }
        (loss, grad)
      case Right(df) =>
        import spark.implicits._
        val bHi = spark.sparkContext.broadcast(hiBits)
        val bLo = spark.sparkContext.broadcast(loBits)
        val bW = spark.sparkContext.broadcast(w)
        // fid -1 carries the loss; everything else is a gradient coordinate
        val contribs = df.as[TrainPair].mapPartitions { it =>
          val grad = new Array[Double](bW.value.length)
          var loss = 0.0
          it.foreach { p =>
            loss += lossAndGrad(p, bHi.value, bLo.value, bW.value,
              if (p.attract) invA else invR, grad)
          }
          Iterator.single((-1, loss)) ++
            grad.iterator.zipWithIndex.collect {
              case (g, f) if g != 0.0 => (f, g)
            }
        }.toDF("fid", "g")
        val rows = contribs.groupBy("fid").agg(sum("g").as("g")).collect()
        // evaluate runs once per line-search probe (thousands per train):
        // without this the per-probe broadcasts accumulate in the
        // BlockManager for the life of the session
        bHi.destroy(); bLo.destroy(); bW.destroy()
        val grad = new Array[Double](w.length)
        var loss = 0.0
        rows.foreach { r =>
          val f = r.getInt(0)
          if (f < 0) loss = r.getDouble(1) else grad(f) = r.getDouble(1)
        }
        (loss, grad)
    }
  }

  /** Train per-feature weights. Mirrors `SGDSolver::solve`
    * (`sgdsolver.cpp:17-108`). Returns the weight vector indexed by
    * feature id. */
  def train(spark: SparkSession, pairs: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], maxIters: Int = 500): Array[Double] = {
    val n = hiBits.length
    val nAttract: Long = pairs.fold(
      p => p.count(_.attract).toLong, df => df.filter(col("attract")).count())
    val nRepulse: Long = pairs.fold(
      p => p.count(!_.attract).toLong, df => df.filter(!col("attract")).count())
    // 1.0 + deterministic jitter (reference: 1.0 + N(0, 0.01))
    val w = Array.tabulate(n)(i =>
      1.0 + (mix64(0x7EA1L + i).toDouble / Long.MaxValue) * 0.01)
    var (loss, grad) = evaluate(spark, pairs, hiBits, loBits, w,
      nAttract, nRepulse)
    var ewag = 1.0
    var iter = 0
    var done = false
    while (!done && iter < maxIters && loss >= 1.0) {
      val norm = math.max(grad.map(math.abs).max, Double.MinPositiveValue)
      var stepsize = (1.0 / norm) * (1.0 / (iter + 1))
      var gain = 0.0
      var accepted = false
      while (!accepted && stepsize > 1.0e-10) {
        val next = Array.tabulate(n)(i => w(i) - 10.0 * stepsize * grad(i))
        val (nl, ng) = evaluate(spark, pairs, hiBits, loBits, next,
          nAttract, nRepulse)
        gain = loss - nl
        if (gain > 0 && !gain.isNaN) {
          System.arraycopy(next, 0, w, 0, n)
          loss = nl; grad = ng; accepted = true
        } else stepsize /= 100.0
      }
      if (!accepted) done = true
      else {
        ewag = gain + 0.5 * ewag
        if (ewag < 1.0e-20) done = true
      }
      iter += 1
    }
    w
  }

  /** Load a reference-format training directory (`functions.txt`,
    * `attract.txt`, `repulse.txt` — `learning/trainingdata.cpp:65-145`).
    * Returns (pairs, feature hashes indexed by feature id). */
  def load(spark: SparkSession, dir: String): (Array[TrainPair], Array[(Long, Long)]) = {
    val feats = graft.refio.RefFormats.readFunctionFeatures(
      spark, s"$dir/functions.txt")
    val ids = graft.refio.RefFormats.featureIds(feats)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2).toInt))
      .toMap
    val funcFeats = feats.collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) =>
        k -> rs.map(r => ids((r.getLong(1), r.getLong(2)))).toArray
      }
    def pairsOf(file: String, attract: Boolean): Array[TrainPair] = {
      val f = new java.io.File(s"$dir/$file")
      if (!f.exists) Array.empty
      else graft.refio.RefFormats.readPairs(spark, f.getPath).collect()
        .flatMap { r =>
          for (a <- funcFeats.get(r.getString(0));
               b <- funcFeats.get(r.getString(1)))
            yield TrainPair(a, b, attract)
        }
    }
    val hashes = ids.toSeq.sortBy(_._2).map(_._1).toArray
    (pairsOf("attract.txt", attract = true) ++
      pairsOf("repulse.txt", attract = false), hashes)
  }

  /** `WriteWeightsFile` (`simhashtrainer.cpp:71-87`): `hex128 weight`
    * lines, readable back through `RefFormats.readWeights`. */
  def writeWeights(path: String, features: Array[(Long, Long)],
      w: Array[Double]): Unit = {
    val sb = new StringBuilder
    features.indices.foreach { i =>
      sb.append(f"${features(i)._1}%016x${features(i)._2}%016x ${w(i)}%f\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), sb.toString)
  }

  /** Trained weight map for `SimHash.simhashOfHashes` — keyed by the
    * feature hash's high word (`functionsimhash.cpp:153`). */
  def weightMap(features: Array[(Long, Long)], w: Array[Double]): Map[Long, Double] =
    features.indices.map(i => features(i)._1 -> w(i)).toMap
}
