package graft.learning

/** Reproducible solver comparison behind the honest-finding note in
  * SimHashTrainerSpec ("L-BFGS converges the attraction fixtures..."):
  * prints loss/evals/separation per budget for both solvers on the
  * reference's mixed training fixture, plus evals-to-convergence on the
  * attraction fixtures.
  *
  *   sbt -batch "Test/runMain graft.learning.TrainDebug"
  */
object TrainDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestBase.spark
    val dir = "/root/reference/testdata/training"
    val (pairs, features) = SimHashTrainer.load(spark, dir)
    val hi = features.map(_._1); val lo = features.map(_._2)
    def sep(w: Array[Double]): Double = {
      val wm = SimHashTrainer.weightMap(features, w)
      def h(p: TrainPair): Int = {
        val a = graft.core.SimHash.simhashOfHashes(
          p.aFeats.map(f => (hi(f), lo(f))).toSeq, wm)
        val b = graft.core.SimHash.simhashOfHashes(
          p.bFeats.map(f => (hi(f), lo(f))).toSeq, wm)
        java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
      }
      val at = pairs.filter(_.attract); val re = pairs.filter(!_.attract)
      re.map(h).sum.toDouble / re.length - at.map(h).sum.toDouble / at.length
    }
    for (d <- Seq("train_simple_attraction", "train_simple_attraction2",
        "train_simple_attraction3")) {
      val (p2, f2) = SimHashTrainer.load(spark, s"/root/reference/testdata/$d")
      val h2 = f2.map(_._1); val l2 = f2.map(_._2)
      val sg = SimHashTrainer.trainWithStats(spark, Left(p2), h2, l2, maxIters = 500)
      val lb = SimHashTrainer.trainLbfgsWithStats(spark, Left(p2), h2, l2, maxIters = 500)
      println(f"$d%-28s SGD evals=${sg.evals}%5d loss=${sg.loss}%10.4f | LBFGS evals=${lb.evals}%5d loss=${lb.loss}%10.4f")
    }
    for (it <- Seq(10, 25, 50, 100)) {
      val s = SimHashTrainer.trainWithStats(spark, Left(pairs), hi, lo, maxIters = it)
      println(f"SGD   iters=$it%4d evals=${s.evals}%5d loss=${s.loss}%12.4f sep=${sep(s.weights)}%8.3f")
    }
    for (it <- Seq(5, 10, 20, 40, 80, 160)) {
      val s = SimHashTrainer.trainLbfgsWithStats(spark, Left(pairs), hi, lo, maxIters = it)
      println(f"LBFGS iters=$it%4d evals=${s.evals}%5d loss=${s.loss}%12.4f sep=${sep(s.weights)}%8.3f")
    }
    spark.stop()
  }
}
