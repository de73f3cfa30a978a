package graft

/** Round-6 extra benchmark (guide §1.4): time selected declared queries
  * with the built-in NOOP SINK — every column of every row computed and
  * discarded — so the measurement excludes any count-side column pruning
  * and the sink itself. The frozen `graft.Bench` (same queries, `.count()`
  * action) remains the driver's comparable harness; this main exists for
  * isolation evidence cited in OPTIMIZATION_r06.md.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *     sbt "runMain graft.BenchExtra [queryNameSubstr,...]"
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    OracleDump.benchMode = true
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.makeSession(cpus)
    // untimed warmup, as in Bench
    try spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 0)
      .groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    val trials =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "2").toInt)
    val only = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains))
    }
    val baseline = graft.core.Checkpoints.snapshot(spark)
    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"noop: $name")
      val secs = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.core.Checkpoints.sweep(spark, baseline)
        dt
      }
      spark.sparkContext.setJobDescription(null)
      name -> secs.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"noop_total","value":$total%.3f,"unit":"sec","trials":$trials,"stat":"min","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
