package graft

import org.apache.spark.sql.functions._

/** Measurement utility: break the clusters(CC) stage of the scaling job
  * into its serial-vs-distributed parts on a materialized corpus — the
  * attribution behind the round-5 Amdahl-tail work (StageProbe showed the
  * clusters stage scaling only 1.49x from 2 to 8 cores; this pinpoints
  * which internal step is the serial time).
  *
  *   SPARK_GRAFT_CPUS=8 taskset -c 0-7 sbt "runMain graft.CcTailProbe <imagesParquet> <warmImagesParquet>"
  */
object CcTailProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._
    import graft.pipeline.{Dedup, DedupConfig}
    val cfg = DedupConfig()
    // warmup (JIT/codegen), untimed
    Dedup.run(spark.read.parquet(args(1))).select("cluster_id").distinct().count()
    val images = spark.read.parquet(args(0)).localCheckpoint()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"CCTAIL $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = Dedup.signatures(images, cfg).localCheckpoint()
    val pairs = Dedup.verified(Dedup.candidatesMaterialized(
        Dedup.bands(sigs, cfg), cfg), sigs, cfg)
      .union(Dedup.substringPairs(sigs, cfg)).distinct().localCheckpoint()
    println(s"CCTAIL pairs ${pairs.count()}")

    // ---- the clusters stage, step by step (mirrors ConnectedComponents.run
    // local path) ----
    val sym = t("symmetrize+ckpt+count") {
      val s = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .distinct().localCheckpoint()
      println(s"CCTAIL symEdges ${s.count()}")
      s
    }
    val collected = t("collect") { sym.as[(String, String)].collect() }
    val labels = t("unionFindKernel") {
      graft.pipeline.ConnectedComponents.labelsOf(collected)
    }
    val labelsDf = t("labelsToDf") { labels.toSeq.toDF("id", "cluster_id") }
    val out = t("singletonAntiJoin+union") {
      val singletons = images.select(col("image_id").as("id"))
        .join(labelsDf.select("id"), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("cluster_id"))
      labelsDf.union(singletons)
    }
    t("distinctCount") { println(s"CCTAIL clusters ${
      out.select("cluster_id").distinct().count()}") }
    spark.stop()
  }
}
