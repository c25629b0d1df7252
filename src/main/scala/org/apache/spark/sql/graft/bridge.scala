package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. Spark 4 made the conversion
  * `private[sql]` (org.apache.spark.sql.classic.ExpressionUtils), so
  * libraries adding native expressions re-export it from inside the
  * sql package — the established extension pattern (same access trick
  * Spark connectors use).
  */
object bridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
