package graft

import java.nio.file.{Files, Paths}

/** North-rule scaling evidence: the SAME dedup job on the SAME materialized
  * input at two parallelism levels (local[8] standing in for N executors,
  * local[32] for 4N — no real cluster in this sandbox), reporting images/sec
  * at both plus scaling efficiency = (T8/T32)/4. Writes BENCH/BASELINE.md.
  *
  * Usage: runMain graft.ScalingBench [nGroups] [variants] [nDistractors]
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nGroups = args.lift(0).map(_.toInt).getOrElse(1500)
    val variants = args.lift(1).map(_.toInt).getOrElse(4)
    val nDistract = args.lift(2).map(_.toInt).getOrElse(1500)
    val corpusDir = Files.createTempDirectory("graft-scaling").toString

    // materialize the corpus once so both runs read identical bytes
    locally {
      val s = Bench.makeSession("32")
      val (images, _) = graft.images.SyntheticCorpus.generate(
        s, nGroups, variants, nDistract)
      images.write.mode("overwrite").parquet(s"$corpusDir/images")
      s.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }

    def timedRun(cpus: String): (Double, Long, Long) = {
      val s = Bench.makeSession(cpus)
      val images = s.read.parquet(s"$corpusDir/images")
      val t0 = System.nanoTime()
      val clusters = graft.pipeline.Dedup.run(images, graft.pipeline.DedupConfig())
      val nClusters = clusters.select("cluster_id").distinct().count()
      val sec = (System.nanoTime() - t0) / 1e9
      val n = images.count()
      s.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (sec, n, nClusters)
    }

    // warm JIT/classloading with a small run so the 8-core run (first) is not
    // penalized by one-time JVM costs
    timedRun("8") match { case _ => () }
    val (t8, n, c8) = timedRun("8")
    val (t32, _, c32) = timedRun("32")
    require(c8 == c32, s"cluster counts differ across parallelism: $c8 vs $c32")
    val ips8 = n / t8
    val ips32 = n / t32
    val eff = (ips32 / ips8) / 4.0
    val md =
      f"""# BENCH — scaling evidence (north rule)
         |
         |Same end-to-end dedup job (read parquet -> featurize -> SimHash ->
         |LSH bands -> candidates -> Hamming/Jaccard verify -> substring pass ->
         |connected components) on the same materialized input, run at two
         |parallelism levels. local[8] stands in for N executors, local[32]
         |for 4N (sandbox has no real cluster).
         |
         || metric | local[8] | local[32] |
         || --- | --- | --- |
         || wall time (s) | $t8%.2f | $t32%.2f |
         || throughput (images/sec) | $ips8%.1f | $ips32%.1f |
         |
         |- corpus: $n images ($nGroups groups x ${variants + 1} + $nDistract distractors)
         |- clusters found: $c8 (identical at both levels — determinism check)
         |- **scaling efficiency (ips32/ips8)/4 = $eff%.3f** (north-rule gate: >= 0.8)
         |""".stripMargin
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(md)
  }
}
