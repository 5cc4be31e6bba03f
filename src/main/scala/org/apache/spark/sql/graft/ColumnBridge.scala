package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s for
  * this library's custom codegen'd expressions
  * (`graft.functions.{VectorExpressions, HashExpressions}`).
  *
  * `ExpressionUtils` is `private[sql]` in Spark 4, so the conversion lives
  * in an `org.apache.spark.sql` subpackage — the established pattern for
  * Spark-native libraries that ship their own expressions without a
  * SparkSessionExtensions registration step (registration is only needed
  * for SQL-text exposure, which these internal kernels don't require).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a scalar function on an EXISTING session (the
    * `SparkSessionExtensions` path only applies at session build time). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
