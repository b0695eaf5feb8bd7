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

  /** EAGER Column -> Expression conversion: unfolds the whole column-node
    * tree into catalyst expressions now (built-in function nodes become
    * `UnresolvedFunction`s the analyzer then resolves). `expression` defers
    * behind an opaque `ColumnNodeExpression`, which is fine inside Dataset
    * calls but opaque to analysis when returned from a FunctionRegistry
    * builder — this is the conversion SQL-registered composed functions
    * need. */
  def eagerExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
