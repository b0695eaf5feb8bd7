package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProduct}

/** Public wrappers for the custom codegen'd vector expressions. */
object VectorExpressions {
  /** Sequential-order dot product of two `array<double>` columns (codegen'd;
    * see [[org.apache.spark.sql.graftbridge.DotProduct]]). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
