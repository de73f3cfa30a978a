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
