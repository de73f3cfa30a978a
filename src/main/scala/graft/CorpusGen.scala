package graft

/** CLI: materialize a deterministic planted-duplicate corpus to parquet.
  *
  *   runMain graft.CorpusGen <outDir> [nGroups] [variants] [nDistractors]
  *
  * Writes <outDir>/images (pipeline input, input_hint schema) and
  * <outDir>/truth_groups (ground-truth cluster assignments).
  */
object CorpusGen {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nGroups = args.lift(1).map(_.toInt).getOrElse(100)
    val variants = args.lift(2).map(_.toInt).getOrElse(3)
    val nDistract = args.lift(3).map(_.toInt).getOrElse(100)
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val (images, truth) = graft.images.SyntheticCorpus.generate(
      spark, nGroups, variants, nDistract)
    images.write.mode("overwrite").parquet(s"$out/images")
    truth.write.mode("overwrite").parquet(s"$out/truth_groups")
    println(s"wrote ${spark.read.parquet(s"$out/images").count()} images to $out")
    spark.stop()
  }
}
