package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * `Column` API.
  *
  * Spark 4 moved the `Column` ↔ `Expression` conversion helpers into
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * This one-file shim lives in package `org.apache.spark.sql` purely to
  * forward those two conversions; nothing else in the repo touches Spark
  * internals.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builtin-style function on a LIVE session (the
    * `SparkSessionExtensions` path only binds at session construction).
    */
  def registerFunction(
      spark: SparkSession,
      ident: catalyst.FunctionIdentifier,
      info: catalyst.expressions.ExpressionInfo,
      builder: Seq[catalyst.expressions.Expression] => catalyst.expressions.Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
}
