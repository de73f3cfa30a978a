package graft.expr

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase
import graft.ops.EmbeddingOps

/** The native codegen dot-product expression: bit-identical to the legacy
  * compiled UDF it replaced, correct null semantics, and the plan actually
  * stays inside whole-stage codegen. */
class VectorExprsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("graft_dot is bit-identical to the legacy UDF on real embeddings") {
    val n = emb.count()
    val a = emb.select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.select(((col("vec_id") + 1) % n).as("vec_id"),
      col("embedding").as("eb"))
    val both = a.join(b, "vec_id")
      .select(
        EmbeddingOps.dotCol(col("ea"), col("eb")).as("x"),
        EmbeddingOps.dotUdfLegacy(col("ea"), col("eb")).as("y"))
      .collect()
    assert(both.length === n)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null / empty / length-mismatch semantics") {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", ArrayType(FloatType, containsNull = false), nullable = true),
      StructField("b", ArrayType(FloatType, containsNull = false), nullable = true)))
    val rows = java.util.Arrays.asList(
      Row(0, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
      Row(1, Array(1f, 2f, 3f), Array(4f, 5f)), // min-length contract
      Row(2, Array.empty[Float], Array(1f, 2f)), // empty -> 0.0
      Row(3, null, Array(1f, 2f)), // null input -> null output
      Row(4, Array(1f), null))
    val out = spark.createDataFrame(rows, schema)
      .select(col("id"), EmbeddingOps.dotCol(col("a"), col("b")).as("d"))
      .collect().sortBy(_.getInt(0))
    assert(out(0).getDouble(1) === 32.0)
    assert(out(1).getDouble(1) === 14.0)
    assert(out(2).getDouble(1) === 0.0)
    assert(out(3).isNullAt(1))
    assert(out(4).isNullAt(1))
  }

  test("interpreted eval matches codegen (Literal fast path)") {
    val lit = (v: Seq[Float]) =>
      Literal.create(v, ArrayType(FloatType, containsNull = false))
    assert(DotProductF(lit(Seq(1f, 2f, 3f)), lit(Seq(4f, 5f, 6f)))
      .eval(null) === 32.0)
    assert(DotProductF(lit(Seq.empty), lit(Seq(1f))).eval(null) === 0.0)
  }

  test("the projection stays inside whole-stage codegen (no UDF boundary)") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val exec = emb
      .select(EmbeddingOps.dotCol(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan
    val plan = exec.toString
    assert(!plan.contains("ScalaUDF"), plan)
    // the dot must sit INSIDE a WholeStageCodegenExec subtree (rendered as
    // the `*(n)` prefix), not fall back to interpreted projection
    val inside = exec.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.toLowerCase.contains("graft_dot"))
    assert(inside, plan)
  }

  test("SQL surface: graft_dot registers through the extension builder") {
    VectorExprs.register(spark)
    emb.createOrReplaceTempView("emb_expr_spec")
    val r = spark.sql(
      "SELECT sum(graft_dot(embedding, embedding)) AS s FROM emb_expr_spec")
      .collect()(0)
    assert(r.getDouble(0) > 0.0)
  }
}
