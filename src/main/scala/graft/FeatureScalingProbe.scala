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
    run(8) // warm JIT
    run(32)
    val t8 = run(8)
    val t32 = run(32)
    println(f"[probe] n=$n t8=$t8%.2f t32=$t32%.2f speedup=${t8 / t32}%.2f eff=${t8 / t32 / 4}%.3f imgs/s@32=${n / t32}%.0f")
  }
}
