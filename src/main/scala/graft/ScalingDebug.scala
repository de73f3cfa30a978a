package graft

/** Dev utility: per-stage wall times of the dedup pipeline at a given
  * parallelism, to localize scaling bottlenecks. */
object ScalingDebug {
  def main(args: Array[String]): Unit = {
    val corpus = args(0)
    val cpus = args.lift(1).getOrElse("8")
    val spark = Bench.makeSession(cpus)
    val cfg = graft.pipeline.DedupConfig()
    val images = spark.read.parquet(corpus)
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sigs = timed("signatures")(
      graft.pipeline.Dedup.signatures(images, cfg).localCheckpoint())
    val bands = graft.pipeline.Dedup.bands(sigs, cfg)
    val cands = timed("bands+candidates")(
      graft.pipeline.Dedup.candidates(bands, cfg).localCheckpoint())
    val ver = timed("verify")(
      graft.pipeline.Dedup.verified(cands, sigs, cfg).localCheckpoint())
    val sub = timed("substring")(
      graft.pipeline.Dedup.substringPairs(sigs, cfg).localCheckpoint())
    val pairs = ver.union(sub)
    val clusters = timed("cc")(
      graft.pipeline.Dedup.clusters(images, pairs).localCheckpoint())
    println(s"[stage] clusters=${clusters.select("cluster_id").distinct().count()}")
    // end-to-end run as ScalingBench times it (fresh DAG, no stage caches)
    timed("full_run")(
      graft.pipeline.Dedup.run(spark.read.parquet(corpus))
        .select("cluster_id").distinct().count())
    spark.stop()
  }
}
