package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.EmbeddingOps

/** Measurement utility: A/B of the embedding dot-product kernel — the
  * native codegen Catalyst expression (`graft.expr.DotProductF`, wired as
  * `EmbeddingOps.dotCol`) vs the compiled Scala UDF it replaced
  * (`dotUdfLegacy`) — on the exact O(n²) cosine-pair verify loop, the
  * hottest consumer of the kernel (q20's shape). Both variants run the
  * SAME plan modulo the dot implementation; wall is min-of-N and result
  * counts are asserted equal (bit-identical arithmetic contract,
  * VectorExprsSpec).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.DotAb [minCos] [trials]"
  */
object DotAb {
  def main(args: Array[String]): Unit = {
    val minCos = args.lift(0).map(_.toDouble).getOrElse(0.4)
    val trials = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Bench.makeSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
    val n = emb.count()

    // q20's exact pair loop with the dot implementation as the variable
    def pairs(dot: (Column, Column) => Column): DataFrame = {
      val withNorm = emb
        .withColumn("nrm", sqrt(dot(col("embedding"), col("embedding"))))
        .repartition(spark.sparkContext.defaultParallelism) // EmbeddingOps.fanOut
      val a = withNorm.select(col("vec_id").as("a"),
        col("embedding").as("a_emb"), col("nrm").as("a_nrm"))
      val b = withNorm.select(col("vec_id").as("b"),
        col("embedding").as("b_emb"), col("nrm").as("b_nrm"))
      a.join(broadcast(b), col("a") < col("b"))
        .withColumn("cos", dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
        .filter(col("cos") >= minCos)
    }

    def measure(name: String, dot: (Column, Column) => Column): (Double, Long) = {
      var rows = 0L
      val sec = (1 to math.max(1, trials)).map { _ =>
        val t0 = System.nanoTime()
        rows = pairs(dot).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"""{"variant":"$name","sec":$sec%.3f,"rows":$rows,"n":$n,"minCos":$minCos,"trials":$trials,"stat":"min"}""")
      (sec, rows)
    }

    // interleave-free order: UDF first so JIT warmup penalizes the LEGACY
    // side if anything (the warmup query in makeSession covers parquet)
    val (udfSec, udfRows) = measure("scala_udf", EmbeddingOps.dotUdfLegacy(_, _))
    val (exprSec, exprRows) = measure("codegen_expr", EmbeddingOps.dotCol)
    require(udfRows == exprRows, s"row mismatch: $udfRows vs $exprRows")
    println(f"""{"metric":"dot_ab_speedup","value":${udfSec / exprSec}%.3f,"udf_sec":$udfSec%.3f,"expr_sec":$exprSec%.3f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
