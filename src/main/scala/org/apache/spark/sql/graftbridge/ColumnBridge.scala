package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into `private[sql]` Column <-> Expression conversion (Spark 4 moved
 * Column to a plan-agnostic representation; `classic.ExpressionUtils` is the
 * supported internal hook). Lives under `org.apache.spark.sql` purely for
 * access — the standard pattern used by Spark connector/extension libraries.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
