package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 moved the classic Column internals behind `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extension libraries
  * that define native Catalyst expressions reach them through a shim in the
  * `org.apache.spark.sql` namespace — the same pattern Spark connector and
  * extension projects use. This is the only file outside the `graft`
  * package.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
