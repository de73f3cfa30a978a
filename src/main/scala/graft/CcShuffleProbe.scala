package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Measurement utility (cited in BENCH.md): shuffle bytes of the
  * ConnectedComponents distributed loop under long-native keys vs the
  * sign-aware 20-char string encoding TieredDedup used before round 5 —
  * the "2.5× shuffle bytes for pure ceremony" claim, measured instead of
  * estimated. Fixture: `n` vertices in chains of 100 (edge volume forced
  * through the iterative loop with localEdgeThreshold = 0).
  *
  *   sbt "runMain graft.CcShuffleProbe [n]"
  */
object CcShuffleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    import spark.implicits._

    val bytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten); ()
        }
      }
    })

    val edges = spark.range(n).filter(pmod(col("id"), lit(100)) =!= 99)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
      .localCheckpoint()
    val vertices = spark.range(n).select(col("id")).localCheckpoint()

    def pad(c: org.apache.spark.sql.Column) =
      when(c >= 0, concat(lit("1"), format_string("%019d", c)))
        .otherwise(concat(lit("0"),
          format_string("%019d", c - lit(Long.MinValue))))

    def measure(label: String)(body: => Unit): Long = {
      bytes.set(0L)
      body
      Thread.sleep(3000) // listener bus drain
      val b = bytes.get()
      println(f"$label%-12s shuffle_write_bytes=$b%,d")
      b
    }
    // warmup (JIT + codegen), untimed; drain the async listener bus before
    // the first measurement zeroes the counter, or late warmup task-end
    // events leak into the long-native figure and understate the ratio
    graft.pipeline.ConnectedComponents.run(spark, edges, vertices,
      localEdgeThreshold = 0L).count()
    Thread.sleep(3000)

    val longBytes = measure("long-native") {
      graft.pipeline.ConnectedComponents.run(spark, edges, vertices,
        localEdgeThreshold = 0L).count(); ()
    }
    val strBytes = measure("padded-str") {
      graft.pipeline.ConnectedComponents.run(spark,
        edges.select(pad(col("a")).as("a"), pad(col("b")).as("b")),
        vertices.select(pad(col("id")).as("id")),
        localEdgeThreshold = 0L).count(); ()
    }
    println(f"ratio padded/long = ${strBytes.toDouble / longBytes}%.2f (n=$n)")
    spark.stop()
  }
}
