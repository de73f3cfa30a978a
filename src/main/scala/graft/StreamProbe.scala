package graft

/** Per-phase wall-clock attribution for the streaming dedup surface — the
  * streaming sibling of StageProbe, built for the q32 cost audit: times each
  * outer phase of the q32 body (corpus read, input write, streaming drain,
  * evidence reads, clustering) and — with SPARK_GRAFT_STREAM_PROBE set —
  * StreamingDedup.processBatch prints its inner phases too.
  *
  *   SPARK_GRAFT_STREAM_PROBE=1 sbt -batch "runMain graft.StreamProbe"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.streaming.Trigger
    import graft.pipeline.DedupConfig
    val root = "/tmp/graft_streamprobe"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STREAMPROBE outer $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // one untimed full pass warms JIT/codegen exactly like Bench's trial 1
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt
    (1 to trials).foreach { trial =>
      println(s"=== trial $trial ===")
      val total0 = System.nanoTime()
      val stateDir = s"$root/state"
      val inputDir = s"$root/input"
      t("delete state") {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stateDir))
      }
      val images = t("corpus read+count") {
        val (im, _) = OracleDump.sharedCorpus(spark, 40, 3, 30)
        im
      }
      t("input write") {
        images.coalesce(2).write.mode("overwrite").parquet(inputDir)
      }
      t("stream run (AvailableNow)") {
        graft.streaming.StreamingDedup.run(spark, inputDir, stateDir,
          DedupConfig(), Trigger.AvailableNow(), maxFilesPerTrigger = 4,
          metrics = true).awaitTermination()
      }
      t("pairs dump (committed read)") {
        graft.streaming.StreamingDedup.pairsFromState(spark, stateDir)
          .distinct().localCheckpoint().count()
      }
      t("clustersFromState+count") {
        graft.streaming.StreamingDedup.clustersFromState(spark, stateDir)
          .orderBy("image_id").count()
      }
      println(f"STREAMPROBE outer TOTAL ${(System.nanoTime() - total0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
