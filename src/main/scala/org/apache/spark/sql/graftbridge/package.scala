package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversions (Spark 4 moved
  * them behind `classic.ExpressionUtils` during the Connect refactor). This
  * is the supported pattern for libraries shipping custom Catalyst
  * expressions: one tiny file inside the sql package namespace, everything
  * else stays in graft.*.
  */
package object graftbridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
