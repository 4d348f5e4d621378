package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** `classic.ExpressionUtils.column/expression` are private to Spark's
  * sql package; graft needs them to wrap ONE expression kind that the
  * FunctionRegistry route cannot build — an expression carrying a
  * `Broadcast` handle in its constructor (the bloom prefilter: probing
  * bloom BYTES shipped as a column copies the whole array out of the
  * row for every probe — a Broadcast field dereferences once per task).
  * This accessor lives under `org.apache.spark.sql` solely to
  * re-export those two conversions — no other internals are touched. */
object ColumnIntrospection {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
