package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public `Column(expr)` constructor (Column now
  * wraps a ColumnNode for Connect); the classic-mode converters live in
  * `private[sql] ExpressionUtils`. This bridge re-exports the two
  * converters graft needs to plug custom Catalyst expressions (e.g.
  * `graft.gen.GenTokens`) into DataFrame plans — the same
  * package-placement pattern every Spark extension library uses.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Install a function into a LIVE session's registry (sessionState is
    * `private[sql]`). The extension path (`spark.sql.extensions`) covers
    * new sessions; this covers sessions that already exist.
    */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
