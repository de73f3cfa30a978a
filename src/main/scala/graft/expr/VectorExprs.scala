package graft.expr

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftColumns
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Left-to-right double-precision dot product over two `array<float>`
  * columns, as a native Catalyst expression with whole-stage codegen.
  *
  * This is the innermost kernel of every embedding verify loop (the O(n²)
  * exact baselines and the exact-cosine verification behind each ANN
  * variant). A compiled Scala UDF pays a per-row `ArrayData -> Seq[Float]`
  * conversion and breaks the codegen span at the `ScalaUDF` boundary; this
  * expression reads the unsafe array buffers in place (`getFloat`) and
  * keeps the projection inside one `WholeStageCodegen` stage.
  *
  * Arithmetic contract (shared with the DuckDB oracle's
  * `list_dot_product` and the legacy UDF it replaces): widen each float to
  * double, accumulate strictly left to right over `min(len(a), len(b))`
  * elements — bit-identical results to the UDF path, so every dumped
  * oracle value is unchanged. Null array -> null (standard binary-
  * expression null semantics); null ELEMENTS are not supported (embedding
  * columns are `containsNull=false` in practice, same as the UDF path,
  * which NPE'd on them).
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** `graft_dot(a, b)` as a Column — the Dataset-API surface. */
  def dot(a: Column, b: Column): Column =
    GraftColumns.column(
      DotProductF(GraftColumns.expression(a), GraftColumns.expression(b)))

  val dotBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => DotProductF(a, b)
    case other => throw new IllegalArgumentException(
      s"graft_dot expects 2 arguments, got ${other.size}")
  }

  /** Session-local SQL registration (tests / ad-hoc sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftColumns.registerTempFunction(spark, "graft_dot", dotBuilder)
}

/** Catalyst injection point: sessions built with
  * `.config("spark.sql.extensions", "graft.expr.GraftExtensions")` get
  * `graft_dot` as a first-class SQL function (usable from `spark.sql` and
  * `call_function`) — the idiomatic cluster-deployment path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF].getName, "graft_dot"),
      VectorExprs.dotBuilder))
}
