package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's Catalyst expressions and the public Column
  * API. Spark 4 keeps Column↔Expression conversion `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-file
  * shim lives in the sql namespace — the same pattern public Spark
  * extension libraries use.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
