package graft

import java.util.concurrent.{Callable, Executors, TimeUnit}
import scala.jdk.CollectionConverters._

/** Dev utility: pure-JVM (no Spark) thread-scaling probe of the featurize
  * kernel — separates machine limits (memory bandwidth, GC) from Spark
  * scheduling effects when diagnosing pipeline scaling. */
object FeatureScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(4000)
    val images = (0 until n).map { i =>
      val rng = new graft.images.SyntheticCorpus.Rng(7L, i.toLong, 0L)
      val img = graft.images.SyntheticCorpus.baseImage(rng)
      (graft.images.ImageCodec.encode(img, "png"),
        graft.images.SyntheticCorpus.caption(rng, 12))
    }.toArray
    def run(threads: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val tasks = images.map { case (bytes, cap) =>
        new Callable[Long] {
          def call(): Long =
            graft.featurize.ImageFeaturizer.signature(bytes, cap).sim_hi
        }
      }
      pool.invokeAll(tasks.toSeq.asJava).asScala.foreach(_.get())
      pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
      (System.nanoTime() - t0) / 1e9
    }
    val tA = args.lift(1).map(_.toInt).getOrElse(8)
    val tB = args.lift(2).map(_.toInt).getOrElse(32)
    run(tA) // warm JIT
    run(tB)
    val a = run(tA)
    val b = run(tB)
    println(f"[probe] n=$n t$tA=$a%.2f t$tB=$b%.2f speedup=${a / b}%.2f eff=${a / b / (tB.toDouble / tA)}%.3f imgs/s@$tB=${n / b}%.0f")
  }
}
