package graft

/** Per-stage wall-clock attribution for the image dedup pipeline on a
  * materialized corpus — the tool behind the small-corpus bench analysis
  * (each stage checkpointed so its cost cannot leak into the next lazy
  * stage).
  *
  *   runMain graft.StageProbe <imagesParquet> <warmImagesParquet>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import graft.pipeline.{Dedup, DedupConfig}
    val cfg = DedupConfig()
    // JIT/codegen warmup, untimed
    Dedup.run(spark.read.parquet(args(1))).select("cluster_id").distinct().count()
    val images = spark.read.parquet(args(0))
    images.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val total0 = System.nanoTime()
    val sigs = t("signatures+checkpoint") {
      Dedup.signatures(images, cfg).localCheckpoint()
    }
    val bands = t("bands(lazy)") { Dedup.bands(sigs, cfg) }
    val cands = t("candidates+checkpoint") {
      Dedup.candidatesMaterialized(bands, cfg)
    }
    val verified = t("verify+checkpoint") {
      Dedup.verified(cands, sigs, cfg).localCheckpoint()
    }
    val ss = t("substring+checkpoint") {
      Dedup.substringPairs(sigs, cfg).localCheckpoint()
    }
    val cl = t("clusters(CC)+count") {
      Dedup.clusters(images, verified.union(ss))
        .select("cluster_id").distinct().count()
    }
    println(f"STAGE total ${(System.nanoTime() - total0) / 1e9}%.2f s (clusters $cl)")
    spark.stop()
  }
}
