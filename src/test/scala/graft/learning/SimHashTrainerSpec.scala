package graft.learning

import java.nio.file.Files
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.core.{BitOps, SimHash}

/** Port of the reference's trainer tests (`learning/simhashtrainer_test.cpp`):
  * attraction training drives pair distance to 0 on the small corpora
  * (:57-154); repulsion training pushes distances up by >10 bits (:158-264).
  * Plus a finite-difference check of the hand-derived gradient and a
  * local-vs-distributed evaluate parity check.
  */
class SimHashTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private def mkHashes(n: Int, seed: Long): (Array[Long], Array[Long]) = {
    val hi = Array.tabulate(n)(i => graft.images.SyntheticCorpus.mix64(seed + 2 * i))
    val lo = Array.tabulate(n)(i => graft.images.SyntheticCorpus.mix64(seed + 2 * i + 1))
    (hi, lo)
  }

  test("gradient matches finite differences") {
    val (hi, lo) = mkHashes(6, 0xABCL)
    val pair = TrainPair(Array(0, 1, 2, 3), Array(2, 3, 4, 5), attract = true)
    val w = Array.tabulate(6)(i => 1.0 + 0.1 * i)
    val grad = new Array[Double](6)
    val loss = SimHashTrainer.lossAndGrad(pair, hi, lo, w, 1.0, grad)
    val eps = 1e-6
    (0 until 6).foreach { f =>
      val wp = w.clone(); wp(f) += eps
      val wm = w.clone(); wm(f) -= eps
      val lp = SimHashTrainer.lossAndGrad(pair, hi, lo, wp, 1.0, new Array[Double](6))
      val lm = SimHashTrainer.lossAndGrad(pair, hi, lo, wm, 1.0, new Array[Double](6))
      val fd = (lp - lm) / (2 * eps)
      assert(math.abs(grad(f) - fd) < 1e-4,
        s"feature $f: analytic ${grad(f)} vs fd $fd (loss $loss)")
    }
    // repulsion branch too
    val rPair = pair.copy(attract = false)
    val rGrad = new Array[Double](6)
    SimHashTrainer.lossAndGrad(rPair, hi, lo, w, 1.0, rGrad)
    (0 until 6).foreach { f =>
      val wp = w.clone(); wp(f) += eps
      val wm = w.clone(); wm(f) -= eps
      val lp = SimHashTrainer.lossAndGrad(rPair, hi, lo, wp, 1.0, new Array[Double](6))
      val lm = SimHashTrainer.lossAndGrad(rPair, hi, lo, wm, 1.0, new Array[Double](6))
      assert(math.abs(rGrad(f) - (lp - lm) / (2 * eps)) < 1e-4)
    }
  }

  test("simple attraction fixtures train to distance 0 (simhashtrainer_test.cpp:57-154)") {
    val base = "/root/reference/testdata"
    for (d <- Seq("train_simple_attraction", "train_simple_attraction2",
        "train_simple_attraction3")) {
      val dir = new java.io.File(s"$base/$d")
      assume(dir.exists, s"reference fixture $d not present")
      val (pairs, features) = SimHashTrainer.load(spark, dir.getPath)
      assert(pairs.nonEmpty)
      val hi = features.map(_._1); val lo = features.map(_._2)
      val w = SimHashTrainer.train(spark, Left(pairs), hi, lo, maxIters = 200)
      val wm = SimHashTrainer.weightMap(features, w)
      // hash both functions of the first attract pair with trained weights
      val p = pairs.find(_.attract).get
      val hA = SimHash.simhashOfHashes(p.aFeats.map(f => (hi(f), lo(f))).toSeq, wm)
      val hB = SimHash.simhashOfHashes(p.bFeats.map(f => (hi(f), lo(f))).toSeq, wm)
      val hA0 = SimHash.simhashOfHashes(p.aFeats.map(f => (hi(f), lo(f))).toSeq, Map.empty)
      val hB0 = SimHash.simhashOfHashes(p.bFeats.map(f => (hi(f), lo(f))).toSeq, Map.empty)
      assert(hamming(hA, hB) === 0,
        s"$d: trained distance ${hamming(hA, hB)} (untrained ${hamming(hA0, hB0)})")
    }
  }

  test("repulsion training pushes min distance up >10 bits (simhashtrainer_test.cpp:158-210)") {
    // two records sharing 18 of 20 features: untrained distance is small
    val (hi, lo) = mkHashes(22, 0x5EEDL)
    val a = (0 until 20).toArray
    val b = ((0 until 18) ++ Seq(20, 21)).toArray
    val pairs = Array(TrainPair(a, b, attract = false))
    val features = hi.indices.map(i => (hi(i), lo(i))).toArray
    val untrained = hamming(
      SimHash.simhashOfHashes(a.map(f => (hi(f), lo(f))).toSeq, Map.empty),
      SimHash.simhashOfHashes(b.map(f => (hi(f), lo(f))).toSeq, Map.empty))
    val w = SimHashTrainer.train(spark, Left(pairs), hi, lo, maxIters = 100)
    val wm = SimHashTrainer.weightMap(features, w)
    val trained = hamming(
      SimHash.simhashOfHashes(a.map(f => (hi(f), lo(f))).toSeq, wm),
      SimHash.simhashOfHashes(b.map(f => (hi(f), lo(f))).toSeq, wm))
    assert(trained - untrained > 10,
      s"trained $trained vs untrained $untrained")
  }

  test("end-to-end distributed: loadDistributed + Right(df) training from functions.txt") {
    import spark.implicits._
    val base = "/root/reference/testdata/train_simple_attraction2"
    assume(new java.io.File(base).exists, "reference fixture not present")
    // the whole chain is DataFrame jobs: functions.txt explode -> global
    // feature ids -> per-function sorted id vectors -> pair resolution ->
    // distributed groupBy(feature).sum gradient (localPairThreshold = 0
    // forces the distributed solver path; no corpus collect anywhere)
    val (pairDf, features) = SimHashTrainer.loadDistributed(spark, base)
    assert(pairDf.count() > 0)
    val hi = features.map(_._1); val lo = features.map(_._2)
    val w = SimHashTrainer.train(spark, Right(pairDf), hi, lo,
      maxIters = 100, localPairThreshold = 0L)
    val wm = SimHashTrainer.weightMap(features, w)
    val p = pairDf.filter(col("attract")).as[TrainPair].collect().head
    val hA = SimHash.simhashOfHashes(p.aFeats.map(f => (hi(f), lo(f))).toSeq, wm)
    val hB = SimHash.simhashOfHashes(p.bFeats.map(f => (hi(f), lo(f))).toSeq, wm)
    assert(hamming(hA, hB) === 0, s"trained distance ${hamming(hA, hB)}")
    // and the distributed load resolves exactly the pairs the collected
    // loader sees
    val (localPairs, localFeatures) = SimHashTrainer.load(spark, base)
    assert(localFeatures.toSeq === features.toSeq)
    assert(localPairs.length === pairDf.count())
  }

  test("distributed evaluate (groupBy(feature).sum) matches local loop") {
    import spark.implicits._
    val (hi, lo) = mkHashes(16, 0xFEEDL)
    val rng = new graft.images.SyntheticCorpus.Rng(1L, 2L, 3L)
    val pairs = Array.tabulate(40) { i =>
      val a = Array.fill(4 + rng.nextInt(4))(rng.nextInt(16))
      val b = Array.fill(4 + rng.nextInt(4))(rng.nextInt(16))
      TrainPair(a, b, attract = i % 3 != 0)
    }
    val w = Array.tabulate(16)(i => 0.8 + 0.05 * i)
    val nA = pairs.count(_.attract).toLong
    val nR = pairs.length - nA
    val (ll, lg) = SimHashTrainer.evaluate(spark, Left(pairs), hi, lo, w, nA, nR)
    val df = spark.createDataset(pairs.toSeq).repartition(5).toDF()
    val (dl, dg) = SimHashTrainer.evaluate(spark, Right(df), hi, lo, w, nA, nR)
    assert(math.abs(ll - dl) < 1e-9)
    lg.indices.foreach(i => assert(math.abs(lg(i) - dg(i)) < 1e-9))
  }

  /** attract/repulse mean-distance gap under a weight vector — the
    * separation both solvers are graded on (the reference's headline
    * training effect is exactly this gap, README.md:451-461). */
  private def separation(pairs: Array[TrainPair], hi: Array[Long],
      lo: Array[Long], w: Array[Double]): Double = {
    val features = hi.indices.map(i => (hi(i), lo(i))).toArray
    val wm = SimHashTrainer.weightMap(features, w)
    def meanDist(ps: Seq[TrainPair]): Double =
      if (ps.isEmpty) 0.0
      else ps.map { p =>
        hamming(
          SimHash.simhashOfHashes(p.aFeats.map(f => (hi(f), lo(f))).toSeq, wm),
          SimHash.simhashOfHashes(p.bFeats.map(f => (hi(f), lo(f))).toSeq, wm))
          .toDouble
      }.sum / ps.size
    meanDist(pairs.filter(!_.attract).toSeq) -
      meanDist(pairs.filter(_.attract).toSeq)
  }

  test("Lbfgs.minimize is a real L-BFGS: solves 10-d Rosenbrock to ~0") {
    // the textbook correctness check, independent of the SimHash loss
    def rosen(x: Array[Double]): (Double, Array[Double]) = {
      var f = 0.0; val g = new Array[Double](x.length)
      var i = 0
      while (i < x.length - 1) {
        val a = x(i + 1) - x(i) * x(i); val b = 1 - x(i)
        f += 100 * a * a + b * b
        g(i) += -400 * x(i) * a - 2 * b
        g(i + 1) += 200 * a
        i += 1
      }
      (f, g)
    }
    val r = Lbfgs.minimize(rosen, Array.fill(10)(-1.2), maxIters = 200,
      stopBelow = 1e-8)
    assert(r.loss < 1e-8, s"loss ${r.loss} after ${r.iters} iterations")
    assert(r.iters < 150) // gradient descent needs tens of thousands here
  }

  test("L-BFGS converges the attraction fixtures to a lower loss than SGD") {
    // The reference's DEFAULT solver (spii L-BFGS, simhashtrainer.cpp:
    // 184-186) vs its SGD fallback on the reference's own convergence
    // criterion (loss < 1, distance -> 0). Measured on these fixtures
    // L-BFGS lands at loss ~0 where the SGD schedule stops just under the
    // 1.0 gate. NOTE (honest finding, measured via Test/runMain
    // graft.learning.TrainDebug on testdata/training, 64 attract + 128
    // repulse over 166 functions): on MIXED pair sets the SGD solver's
    // aggressive 10/‖g‖∞·1/(iter+1) schedule reaches a given separation in
    // ~3x FEWER evaluations than L-BFGS (79 evals -> separation 69.6 bits
    // vs 549 evals -> 61.3) — the loss surface is multi-basin and rewards
    // annealing-style kicks over curvature modeling, consistent with the
    // reference's own remark that L-BFGS scales poorly and SGD variants
    // are the way forward (doc/01-motivation-and-overview.md:857-861). So
    // the L-BFGS port completes solver parity, while SGD remains the
    // default for the pipeline entries.
    val base = "/root/reference/testdata"
    for (d <- Seq("train_simple_attraction", "train_simple_attraction2",
        "train_simple_attraction3")) {
      val dir = new java.io.File(s"$base/$d")
      assume(dir.exists, s"reference fixture $d not present")
      val (pairs, features) = SimHashTrainer.load(spark, dir.getPath)
      val hi = features.map(_._1); val lo = features.map(_._2)
      val sgd = SimHashTrainer.trainWithStats(spark, Left(pairs), hi, lo,
        maxIters = 500)
      val lb = SimHashTrainer.trainLbfgsWithStats(spark, Left(pairs), hi, lo,
        maxIters = 500)
      assert(lb.loss < 1.0, s"$d: L-BFGS did not converge (loss ${lb.loss})")
      assert(lb.loss <= sgd.loss,
        s"$d: L-BFGS loss ${lb.loss} vs SGD ${sgd.loss}")
      // and the trained weights still satisfy the reference's test
      // criterion: first attract pair at distance 0
      val wm = SimHashTrainer.weightMap(features, lb.weights)
      val p = pairs.find(_.attract).get
      val hA = SimHash.simhashOfHashes(p.aFeats.map(f => (hi(f), lo(f))).toSeq, wm)
      val hB = SimHash.simhashOfHashes(p.bFeats.map(f => (hi(f), lo(f))).toSeq, wm)
      assert(hamming(hA, hB) === 0, s"$d: L-BFGS trained distance nonzero")
    }
  }

  test("L-BFGS widens the separation on the mixed training fixture") {
    val dir = new java.io.File("/root/reference/testdata/training")
    assume(dir.exists, "reference training fixture not present")
    val (pairs, features) = SimHashTrainer.load(spark, dir.getPath)
    assert(pairs.count(_.attract) > 0 && pairs.count(!_.attract) > 0)
    val hi = features.map(_._1); val lo = features.map(_._2)
    val untrained = separation(pairs, hi, lo, Array.fill(features.length)(1.0))
    val lb = SimHashTrainer.trainLbfgsWithStats(spark, Left(pairs), hi, lo,
      maxIters = 40)
    val sep = separation(pairs, hi, lo, lb.weights)
    assert(sep > untrained + 10,
      s"L-BFGS separation $sep vs untrained $untrained")
  }

  test("snapshots: written every 20 iterations, replayable as a training curve") {
    val dir = new java.io.File("/root/reference/testdata/training")
    assume(dir.exists, "reference training fixture not present")
    val (pairDf, features) = SimHashTrainer.loadDistributed(spark, dir.getPath)
    val hi = features.map(_._1); val lo = features.map(_._2)
    val snapDir = Files.createTempDirectory("graft-snapshots").toString
    val st = SimHashTrainer.trainLbfgsWithStats(spark, Right(pairDf), hi, lo,
      maxIters = 45,
      snapshot = SimHashTrainer.snapshotSink(snapDir, features))
    val snaps = new java.io.File(snapDir).listFiles
      .filter(_.getName.endsWith(".snapshot")).map(_.getName).sorted
    assert(snaps.toSeq == Seq("20.snapshot", "40.snapshot"),
      s"expected snapshots at iterations 20 and 40, got ${snaps.toSeq}")
    // the curve: attract mean distance must be non-increasing from snapshot
    // 20 to 40 to the final weights (training monotonically tightens the
    // attract set on this fixture)
    val (byFunc, _) = SimHashTrainer.featureTable(spark,
      graft.refio.RefFormats.readFunctionFeatures(
        spark, s"${dir.getPath}/functions.txt"))
    val pairsKeyed = {
      def p(file: String, attract: Boolean) =
        graft.refio.RefFormats.readPairs(spark, s"${dir.getPath}/$file")
          .withColumn("attract", org.apache.spark.sql.functions.lit(attract))
      p("attract.txt", attract = true)
        .unionByName(p("repulse.txt", attract = false))
    }
    val curve = SimHashTrainer.snapshotCurve(spark, snapDir, byFunc,
      features, pairsKeyed)
      .filter(col("pair_set") === "attract")
      .orderBy("snapshot_iter")
      .collect().map(r => (r.getAs[Int]("snapshot_iter"),
        r.getAs[Double]("mean_dist")))
    assert(curve.map(_._1).toSeq == Seq(20, 40))
    assert(curve(1)._2 <= curve(0)._2,
      s"attract mean distance rose across snapshots: $curve")
    assert(st.loss >= 0.0) // solver ran to completion
  }

  test("weights file round-trips through RefFormats.readWeights") {
    val (hi, lo) = mkHashes(3, 0x111L)
    val features = hi.indices.map(i => (hi(i), lo(i))).toArray
    val w = Array(0.5, 1.25, 2.0)
    val p = Files.createTempFile("weights", ".txt").toString
    SimHashTrainer.writeWeights(p, features, w)
    val back = graft.refio.RefFormats.readWeights(spark, p)
    features.indices.foreach { i =>
      assert(math.abs(back(features(i)._1) - w(i)) < 1e-6)
    }
  }
}
