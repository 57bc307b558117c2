package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column <-> Catalyst Expression
  * converters (Spark 4 wraps Columns in ColumnNodes; this is the supported
  * internal path, same one `functions._` uses). Lives in the spark.sql
  * package solely for access; keep it minimal.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
