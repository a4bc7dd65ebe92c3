package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the Spark 4 unified `Column` (ColumnNode-backed) and
  * Catalyst `Expression`s, for exposing custom expressions as Columns.
  * Lives under `org.apache.spark.sql` to satisfy `private[sql]` access.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
