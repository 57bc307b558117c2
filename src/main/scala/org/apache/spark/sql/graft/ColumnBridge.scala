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

  /** Eagerly converts a Column to a plain Catalyst expression tree
    * (UnresolvedAttribute/UnresolvedFunction/...), unlike [[expression]]
    * whose lazy ColumnNodeExpression wrapper is only unwrapped on Spark's
    * own Dataset API paths — custom logical nodes need the real tree so the
    * analyzer's generic resolution rules apply. */
  def expressionEager(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
