package graft

/** Round-6 plan evidence: write `.explain("formatted")` of named queries
  * (or operator bodies with the checkpoint scope stripped, where a scope's
  * eager materialization would reduce the plan to an RDD scan) to files
  * under plans/r06/. Measurement-only main.
  *
  *   runMain graft.PlanDumpR6 <sfDir> <outDir> <suffix> [query...]
  */
object PlanDumpR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val which = args.drop(3).toSet
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    OracleDump.benchMode = true
    new java.io.File(outDir).mkdirs()
    import org.apache.spark.sql.functions._

    def write(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      if (which.isEmpty || which.contains(name)) {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
      }

    write("q14_fingerprint", SparkEntry.queries("q14_fingerprint")(spark, sfDir))
    write("q45_cluster_split",
      SparkEntry.queries("q45_cluster_split")(spark, sfDir))
    write("q49_caption_rewrite",
      SparkEntry.queries("q49_caption_rewrite")(spark, sfDir))
    // q51's declared query runs inside a checkpoint scope; the unscoped
    // body carries the real operator plan (the PlanDump convention)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    write("q51_fuzzy_decontaminate_unscoped",
      graft.ops.TextOps.fuzzyDecontaminateUnscoped(
        docs.filter(pmod(col("doc_id"), lit(10L)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(10L)) === 0), 0.5))
    spark.stop()
  }
}
