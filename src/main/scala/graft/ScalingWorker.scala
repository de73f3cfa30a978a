package graft

/** One scaling-measurement point: runs the full dedup pipeline at
  * `local[cpus]` inside THIS JVM and prints one parseable result line.
  *
  * Spawned by ScalingBench as a separate `taskset`-pinned process (with
  * `-XX:ActiveProcessorCount=cpus`) so the JVM's entire thread budget —
  * task threads, GC, JIT compiler, shuffle/netty pools — matches the
  * nominal core count. Running all levels inside one 32-core JVM (the
  * round-1 method) lets the "2-core" run JIT-compile and collect garbage
  * on 32 cores, inflating its throughput and understating scaling
  * efficiency; a pinned process per level is the honest stand-in for a
  * cluster of N single-socket executors.
  */
object ScalingWorker {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val corpusDir = args(1)
    val warmDir = args(2)
    val spark = Bench.makeSession(cpus)
    // JIT/classloader warmup on the small corpus — excluded from timing
    graft.pipeline.Dedup.run(spark.read.parquet(warmDir))
      .select("cluster_id").distinct().count()
    val images = spark.read.parquet(corpusDir)
    val n = images.count()
    val t0 = System.nanoTime()
    val clusters = graft.pipeline.Dedup.run(images)
      .select("cluster_id").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: a default locale with a decimal COMMA would emit "12,345"
    // and break ScalingBench's [\d.]+ parse — the emitted line must be
    // locale-independent
    println(String.format(java.util.Locale.ROOT,
      """SCALING_RESULT {"cpus":%s,"sec":%.3f,"images":%d,"clusters":%d}""",
      cpus, Double.box(sec), Long.box(n), Long.box(clusters)))
    spark.stop()
  }
}
