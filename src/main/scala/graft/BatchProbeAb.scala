package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, DedupConfig}

/** Measurement utility: batch image-dedup A/B between the wide exact-band
  * config and the reduced-band multi-probe config on the same planted
  * corpus — wall time (min-of-N), planted-truth recall, and the band-row
  * volume a DedupJob would PERSIST under each. Quantifies the trade the
  * batch `bandProbes` wiring makes: for a self-dedup batch the transient
  * probe rows roughly replace the extra exact bands in the candidate
  * shuffle (total rows comparable), while the stored index shrinks to the
  * reduced band count — the volume that matters at 10^12 records
  * (reference bucket layout: `searchbackend/simhashsearchindex.hpp:91-99`).
  *
  *   sbt -batch "runMain graft.BatchProbeAb [nGroups] [variants] [distractors] [trials]"
  */
object BatchProbeAb {
  def main(args: Array[String]): Unit = {
    val nGroups = args.lift(0).map(_.toInt).getOrElse(600)
    val variants = args.lift(1).map(_.toInt).getOrElse(3)
    val distractors = args.lift(2).map(_.toInt).getOrElse(300)
    val trials = args.lift(3).map(_.toInt).getOrElse(2)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    Bench.quietCheckpointRelease()
    val (images, truth) = graft.images.SyntheticCorpus.generate(
      spark, nGroups, variants, distractors)
    images.cache(); truth.cache()
    val n = images.count()
    val tl = truth.select(col("group_id"), col("image_id").as("a"))
    val tr = truth.select(col("group_id"), col("image_id").as("b"))
    val truthPairs = tl.join(tr, "group_id").filter(col("a") < col("b"))
      .select("a", "b").cache()
    val totalTruth = truthPairs.count()

    def measure(name: String, cfg: DedupConfig): String = {
      val base = graft.core.Checkpoints.snapshot(spark)
      val sec = (1 to math.max(1, trials)).map { _ =>
        val t0 = System.nanoTime()
        Dedup.run(images, cfg).groupBy("cluster_id").count().count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Checkpoints.sweep(spark, base)
        dt
      }.min
      // recall + persisted-volume probes (outside the timed window)
      val hit = truthPairs.join(Dedup.clusterPairs(Dedup.run(images, cfg)),
        Seq("a", "b"), "left_semi").count()
      graft.core.Checkpoints.sweep(spark, base)
      val sigs = if (cfg.bandProbes > 0) Dedup.signaturesWithMargins(images, cfg)
        else Dedup.signatures(images, cfg)
      val storedRows = Dedup.bands(sigs, cfg).count()
      f"""{"config":"$name","sec":$sec%.3f,"images_per_sec":${n / sec}%.1f,""" +
        f""""recall":"$hit/$totalTruth","stored_band_rows":$storedRows}"""
    }

    val wide = measure("wide_28band", DedupConfig())
    val probed = measure("probe_8band3", DedupConfig(nBands = 8, bandProbes = 3))
    println(s"""{"images":$n,"trials":$trials,"stat":"min","runs":[$wide,$probed]}""")
    spark.stop()
  }
}
