package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters (Spark 4
  * moved Column onto ColumnNode; `ExpressionUtils` is the sanctioned
  * internal path). Lives under org.apache.spark.sql to satisfy the
  * package-private access — the only Spark-internal touchpoint in this repo.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
