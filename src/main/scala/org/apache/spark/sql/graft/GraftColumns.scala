package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Expression <-> Column converters (Spark 4
  * moved Column onto ColumnNode; `ExpressionUtils` is the classic-session
  * bridge). This is the ONLY file living outside the `graft` namespace, and
  * it exists solely so custom codegen Catalyst expressions can be used
  * through the public Column API without forcing every session to configure
  * `spark.sql.extensions`.
  */
object GraftColumns {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Session-local SQL registration of a custom expression (the
    * non-extension path used by tests and ad-hoc sessions; cluster sessions
    * configure `spark.sql.extensions=graft.expr.GraftExtensions` instead). */
  def registerTempFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
