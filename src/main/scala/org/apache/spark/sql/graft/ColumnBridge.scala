package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 routes `Column` through `ColumnNode`; the classic-mode converter
  * lives in `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * package-private to `org.apache.spark.sql`. This object re-exports the two
  * conversions we need for graft's custom expressions (cosine similarity,
  * t-distribution p-value, simhash).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
