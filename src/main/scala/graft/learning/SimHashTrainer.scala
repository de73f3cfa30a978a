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

  /** Solver outcome: trained weights plus the probe-evaluation count (the
    * unit of training cost — every evaluation is a full pass over the pair
    * set, distributed or local) and the final loss. */
  final case class TrainStats(weights: Array[Double], evals: Int,
      loss: Double)

  /** The reference's snapshot callback (`simhashtrainer.cpp:132-149`):
    * every `SnapshotEvery` accepted iterations, write the current weights
    * as `<dir>/<iter>.snapshot` in the weights-file format — the input of
    * the reference's `evalsimhashweights` snapshot-curve workflow. */
  val SnapshotEvery = 20

  def snapshotSink(dir: String,
      features: Array[(Long, Long)]): (Int, Array[Double]) => Unit = {
    new java.io.File(dir).mkdirs()
    (iter, w) => writeWeights(s"$dir/$iter.snapshot", features, w)
  }

  private val NoSnapshot: (Int, Array[Double]) => Unit = (_, _) => ()

  /** Shared solver prelude: local short-circuit, persistence, pair-set
    * counts, deterministic init (reference: 1.0 + N(0, 0.01),
    * `simhashtrainer.cpp:100-107`). */
  private def prep(spark: SparkSession,
      pairs0: Either[Array[TrainPair], DataFrame], n: Int,
      localPairThreshold: Long): (Either[Array[TrainPair], DataFrame],
      Long, Long, Array[Double]) = {
    import spark.implicits._
    val pairs: Either[Array[TrainPair], DataFrame] = pairs0 match {
      case Right(df) if df.count() <= localPairThreshold =>
        Left(df.orderBy(col("attract"), col("aFeats"), col("bFeats"))
          .as[TrainPair].collect())
      case other => other
    }
    pairs.foreach(df =>
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val nAttract: Long = pairs.fold(
      p => p.count(_.attract).toLong, df => df.filter(col("attract")).count())
    val nRepulse: Long = pairs.fold(
      p => p.count(!_.attract).toLong, df => df.filter(!col("attract")).count())
    val w = Array.tabulate(n)(i =>
      1.0 + (mix64(0x7EA1L + i).toDouble / Long.MaxValue) * 0.01)
    (pairs, nAttract, nRepulse, w)
  }

  /** Train per-feature weights. Mirrors `SGDSolver::solve`
    * (`sgdsolver.cpp:17-108`). Returns the weight vector indexed by
    * feature id.
    *
    * `Right(df)` is the scale path: the solver evaluates loss+gradient as a
    * distributed `groupBy(feature).sum` pass per line-search probe. A pair
    * set at or below `localPairThreshold` rows short-circuits to the local
    * loop over the SAME kernel (sorted for a deterministic FP summation
    * order) — thousands of probe-sized Spark jobs would be pure scheduling
    * overhead at that size. */
  def train(spark: SparkSession, pairs0: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], maxIters: Int = 500,
      localPairThreshold: Long = 10000L): Array[Double] =
    trainWithStats(spark, pairs0, hiBits, loBits, maxIters,
      localPairThreshold).weights

  def trainWithStats(spark: SparkSession,
      pairs0: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], maxIters: Int = 500,
      localPairThreshold: Long = 10000L,
      snapshot: (Int, Array[Double]) => Unit = NoSnapshot): TrainStats = {
    val n = hiBits.length
    val (pairs, nAttract, nRepulse, w) =
      prep(spark, pairs0, n, localPairThreshold)
    var evals = 0
    def eval(x: Array[Double]): (Double, Array[Double]) = {
      evals += 1
      evaluate(spark, pairs, hiBits, loBits, x, nAttract, nRepulse)
    }
    var (loss, grad) = eval(w)
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
        val (nl, ng) = eval(next)
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
      if (iter % SnapshotEvery == 0) snapshot(iter, w.clone())
    }
    pairs.foreach(_.unpersist(false))
    TrainStats(w, evals, loss)
  }

  /** L-BFGS solver — the reference's DEFAULT optimizer
    * (`spii::LBFGSSolver`, selected at `simhashtrainer.cpp:184-186`; the
    * published training results are 100-500 L-BFGS steps,
    * `doc/01-motivation-and-overview.md:380-424`). Classic two-loop
    * recursion (Nocedal & Wright, Algorithm 7.4) with memory `m`, H0
    * scaled by the latest curvature pair, and Armijo backtracking from a
    * unit step. Runs over the SAME `evaluate()` as the SGD solver, so the
    * distributed `groupBy(feature).sum` scale path is shared — L-BFGS just
    * needs far fewer of those passes per unit of loss decrease (each
    * iteration typically accepts the unit step after history warms up,
    * where SGD's 1/(iter+1) schedule crawls). */
  def trainLbfgs(spark: SparkSession,
      pairs0: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], maxIters: Int = 500,
      localPairThreshold: Long = 10000L): Array[Double] =
    trainLbfgsWithStats(spark, pairs0, hiBits, loBits, maxIters,
      localPairThreshold).weights

  def trainLbfgsWithStats(spark: SparkSession,
      pairs0: Either[Array[TrainPair], DataFrame],
      hiBits: Array[Long], loBits: Array[Long], maxIters: Int = 500,
      localPairThreshold: Long = 10000L, m: Int = 10,
      snapshot: (Int, Array[Double]) => Unit = NoSnapshot): TrainStats = {
    val n = hiBits.length
    val (pairs, nAttract, nRepulse, w0) =
      prep(spark, pairs0, n, localPairThreshold)
    val r = Lbfgs.minimize(
      x => evaluate(spark, pairs, hiBits, loBits, x, nAttract, nRepulse),
      w0, maxIters, m,
      stopBelow = 1.0, // the trainer's convergence rule (sgdsolver.cpp:58-63)
      // first step at the SGD solver's aggressive initial scale (10/‖g‖∞):
      // the loss surface rewards large weight moves (bits only flip when
      // accumulators cross zero) and the expansion search corrects overshoot
      firstStepScale = 10.0,
      onIteration = (iter, x) =>
        if (iter % SnapshotEvery == 0) snapshot(iter, x.clone()))
    pairs.foreach(_.unpersist(false))
    TrainStats(r.x, r.evals, r.loss)
  }

  /** Distributed feature-vector construction — the Spark form of the
    * reference loader's first pass (`learning/trainingdata.cpp:65-95`):
    * global feature dedup + deterministic id assignment (U2,
    * `RefFormats.featureIds`) and one groupBy building each record's
    * sorted feature-id array. Nothing corpus-sized reaches the driver;
    * only the distinct-feature hash table is collected — that is the
    * weight vector's index, which the driver-side solver must hold anyway
    * (exactly as the reference's in-memory trainer does).
    *
    * @param funcFeats (function_key, feature_hi, feature_lo) exploded rows
    * @return ((function_key, feats: Array[Int]), feature hashes by id)
    */
  def featureTable(spark: SparkSession,
      funcFeats: DataFrame): (DataFrame, Array[(Long, Long)]) = {
    val ids = featureIdTable(funcFeats)
    (featureVectors(funcFeats, ids), collectHashes(ids))
  }

  /** The materialized global feature-id table — split out so callers can
    * overlap [[collectHashes]] with other jobs (the collect and the
    * [[featureVectors]] groupBy are independent consumers of it). */
  def featureIdTable(funcFeats: DataFrame): DataFrame =
    graft.refio.RefFormats.featureIds(funcFeats).localCheckpoint()

  /** Per-record sorted feature-id vectors from the id table. */
  def featureVectors(funcFeats: DataFrame, ids: DataFrame): DataFrame =
    funcFeats.join(ids, Seq("feature_hi", "feature_lo"))
      .groupBy("function_key")
      .agg(sort_array(collect_list(col("feature_id").cast("int"))).as("feats"))

  /** The feature hash table indexed by id (the driver-side weight index). */
  def collectHashes(ids: DataFrame): Array[(Long, Long)] =
    ids.orderBy("feature_id").collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Distributed pair resolution (J4, second pass of
    * `learning/trainingdata.cpp:96-145`): `pairs` (a, b, attract) joined
    * to the per-record feature vectors. Pairs naming unknown records drop
    * out (inner join) — the reference skips them the same way. The result
    * feeds `train(spark, Right(df), ...)` directly. */
  def resolvePairs(byFunc: DataFrame, pairs: DataFrame): DataFrame =
    pairs
      .join(byFunc.select(col("function_key").as("a"),
        col("feats").as("aFeats")), "a")
      .join(byFunc.select(col("function_key").as("b"),
        col("feats").as("bFeats")), "b")
      .select("aFeats", "bFeats", "attract")

  /** Load a reference-format training directory (`functions.txt`,
    * `attract.txt`, `repulse.txt` — `learning/trainingdata.cpp:65-145`) as
    * a DISTRIBUTED resolved pair table + the feature hash table. The
    * corpus never reaches the driver (featurize, id assignment, and pair
    * resolution are all DataFrame jobs); the result feeds
    * `train(spark, Right(df), ...)`. */
  def loadDistributed(spark: SparkSession,
      dir: String): (DataFrame, Array[(Long, Long)]) = {
    val feats = graft.refio.RefFormats.readFunctionFeatures(
      spark, s"$dir/functions.txt")
    val (byFunc, hashes) = featureTable(spark, feats)
    def pairsOf(file: String, attract: Boolean): Option[DataFrame] = {
      val f = new java.io.File(s"$dir/$file")
      if (!f.exists) None
      else Some(graft.refio.RefFormats.readPairs(spark, f.getPath)
        .withColumn("attract", lit(attract)))
    }
    val pairs = (pairsOf("attract.txt", attract = true).toSeq ++
      pairsOf("repulse.txt", attract = false).toSeq)
      .reduceOption(_.unionByName(_))
      .getOrElse(spark.emptyDataFrame
        .withColumn("a", lit("")).withColumn("b", lit(""))
        .withColumn("attract", lit(true)).limit(0))
    (resolvePairs(byFunc, pairs), hashes)
  }

  /** `loadDistributed`, collected — only the RESOLVED PAIRS land on the
    * driver (bounded by the labeled pair count, not the corpus), for the
    * local solver short-circuit on small training sets. */
  def load(spark: SparkSession,
      dir: String): (Array[TrainPair], Array[(Long, Long)]) = {
    import spark.implicits._
    val (pairDf, hashes) = loadDistributed(spark, dir)
    (pairDf.orderBy(col("attract"), col("aFeats"), col("bFeats"))
      .as[TrainPair].collect(), hashes)
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

  /** The reference's snapshot-eval workflow (run `evalsimhashweights` over
    * each `<iter>.snapshot` a training run left behind — its headline
    * retrieval numbers come from a 420-step snapshot, `doc/01-motivation-
    * and-overview.md:576-594`): for every snapshot, hash each record under
    * those weights and report the labeled pair-set distance stats — the
    * training curve over iterations.
    *
    * @param byFunc (function_key, feats) per-record feature-id vectors
    *   (from `featureTable`)
    * @param pairs  (a, b, attract) labeled pairs by function key
    * @return (snapshot_iter, pair_set, n_pairs, mean_dist, min_dist,
    *   max_dist), one row per snapshot × pair set */
  def snapshotCurve(spark: SparkSession, snapshotDir: String,
      byFunc: DataFrame, hashes: Array[(Long, Long)],
      pairs: DataFrame): DataFrame = {
    val files = Option(new java.io.File(snapshotDir).listFiles()).getOrElse(
        Array.empty[java.io.File])
      .filter(_.getName.endsWith(".snapshot"))
      .sortBy(_.getName.stripSuffix(".snapshot").toInt)
    require(files.nonEmpty, s"no .snapshot files under $snapshotDir")
    val bHashes = spark.sparkContext.broadcast(hashes)
    files.toSeq.map { f =>
      val iter = f.getName.stripSuffix(".snapshot").toInt
      val wm = graft.refio.RefFormats.readWeights(spark, f.getPath)
      val bW = spark.sparkContext.broadcast(wm)
      val sigUdf = udf((fs: Seq[Int]) => {
        val hs = fs.map(i => bHashes.value(i))
        graft.core.SimHash.simhashOfHashes(hs, bW.value)
      })
      val sims = byFunc
        .select(col("function_key"), sigUdf(col("feats")).as("sg"))
        .select(col("function_key"), col("sg._1").as("sim_hi"),
          col("sg._2").as("sim_lo"))
      Seq(true, false).map { att =>
        graft.refio.RefFormats.pairDistanceStats(
            pairs.filter(col("attract") === att).select("a", "b"), sims)
          .withColumn("snapshot_iter", lit(iter))
          .withColumn("pair_set", lit(if (att) "attract" else "repulse"))
      }.reduce(_.unionByName(_))
    }.reduce(_.unionByName(_))
      .select("snapshot_iter", "pair_set", "n_pairs", "mean_dist",
        "min_dist", "max_dist")
  }
}
