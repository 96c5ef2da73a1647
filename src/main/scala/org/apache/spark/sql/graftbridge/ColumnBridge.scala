package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst-Expression bridge.
  *
  * Spark 4 moved `Column` to a ColumnNode representation; the converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`) are `private[sql]`, so
  * libraries exposing native expressions place a shim inside the
  * `org.apache.spark.sql` package — the standard pattern used by public
  * Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
