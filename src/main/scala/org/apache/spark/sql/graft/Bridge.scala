package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made the `Column(expr)` constructor
  * and `.expr` accessor `private[sql]` (Column is API-agnostic now); custom
  * Catalyst expressions still need both, so this lives in an
  * org.apache.spark.sql subpackage — the standard extension seam.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
