package graft

import org.apache.spark.sql.streaming.Trigger
import graft.pipeline.DedupConfig
import graft.streaming.StreamingDedup

/** spark-submit entrypoint for the streaming incremental dedup pipeline —
  * the streaming sibling of `DedupJob`.
  *
  *   spark-submit --class graft.StreamJob app.jar <inputDir> <stateDir> [intervalSec]
  *
  * Without `intervalSec`, drains every file currently in <inputDir> in
  * bounded micro-batches (`Trigger.AvailableNow`), writes the clustering of
  * everything ingested so far to <stateDir>/clusters_out, and exits — safe
  * to re-launch as new files land (the streaming checkpoint skips files
  * already processed, and the band index / pair log carry forward). With
  * `intervalSec`, tails the directory continuously; clustering then runs as
  * a separate periodic invocation of the no-interval form against the same
  * state (connected components is a global fixpoint and stays out of the
  * per-batch path).
  *
  * Per-batch observability lands in <stateDir>/metrics (batch id, new rows,
  * index rows probed, candidate/accepted pair counts).
  */
object StreamJob {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: graft.StreamJob <inputDir> <stateDir> [intervalSec]")
      sys.exit(2)
    }
    val input = args(0)
    val stateDir = args(1)
    val interval = args.lift(2).map(_.toInt)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val trigger = interval
      .map(s => Trigger.ProcessingTime(s * 1000L))
      .getOrElse(Trigger.AvailableNow())
    val q = StreamingDedup.run(spark, input, stateDir, DedupConfig(),
      trigger, metrics = true)
    q.awaitTermination()
    if (interval.isEmpty) {
      val clusters = StreamingDedup.clustersFromState(spark, stateDir)
      clusters.write.mode("overwrite").parquet(s"$stateDir/clusters_out")
      println(s"clusters: ${spark.read.parquet(s"$stateDir/clusters_out").count()} rows")
    }
    spark.stop()
  }
}
