package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 split `Column` from catalyst `Expression` (columns now wrap
  * ColumnNodes); the official converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils` but are `private[sql]`.
  * This tiny bridge — placed in the `org.apache.spark.sql` package for
  * access — is the one sanctioned way for a library to register custom
  * Catalyst expressions as Columns without forking Spark.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a function on a live session (sessionState is private[sql]). */
  def registerFunction(spark: SparkSession,
      id: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(id, info, builder)
}
