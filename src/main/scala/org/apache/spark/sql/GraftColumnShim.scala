package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column↔Expression converters (Spark 4
  * removed the public `new Column(expr)` constructor). Lives in the
  * org.apache.spark.sql package solely to cross that visibility boundary;
  * the public surface is graft.functions.
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** The session's stable unique id (`private[sql]` on the api class) —
    * keys per-session state such as graft's D1 transaction buffers.
    */
  def sessionUUID(s: SparkSession): String =
    s.asInstanceOf[classic.SparkSession].sessionUUID

  /** Eagerly convert a Column's node tree to a catalyst Expression.
    * `expression` wraps non-trivial nodes in a lazy `ColumnNodeExpression`
    * that only the DataFrame analysis path unwraps — an expression
    * embedded in a FunctionRegistry builder output never goes through
    * that path and would reach codegen unresolved.
    */
  def resolvedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
