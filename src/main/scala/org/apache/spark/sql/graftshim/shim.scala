package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` API: Column <-> Expression.
  *
  * Spark 4 made the Column/Expression boundary private (Columns wrap
  * ColumnNodes); every Catalyst-extending library needs exactly this
  * bridge, and placing it under `org.apache.spark.sql` is the sanctioned
  * pattern for it. Nothing else in this repo reaches into Spark
  * private API.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
