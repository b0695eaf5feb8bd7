package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graftbridge.{ColumnBridge, CosineSim, DotProduct, GraftExtensions}

/** Public wrappers for the custom codegen'd vector expressions. */
object VectorExpressions {
  /** Sequential-order dot product of two `array<double|float>` columns
    * (codegen'd; see [[org.apache.spark.sql.graftbridge.DotProduct]]). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Single-pass cosine similarity (codegen'd; zero-norm -> 0.0; see
    * [[org.apache.spark.sql.graftbridge.CosineSim]]). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Make the functions above callable from SQL text on a live session
    * (`SELECT dot_product(a, b) ...`). For session-build-time registration use
    * `spark.sql.extensions=org.apache.spark.sql.graftbridge.GraftExtensions`. */
  def registerSql(spark: SparkSession): Unit = GraftExtensions.register(spark)
}
