package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Registration surface for graft's custom Catalyst expressions, so SQL text
 * can call them (`SELECT dot_product(a, b) FROM ...`):
 *
 *  - cluster-config path: `--conf spark.sql.extensions=
 *    org.apache.spark.sql.graftbridge.GraftExtensions` (applied at session
 *    build time, the standard extension-library mechanism);
 *  - imperative path: `GraftExtensions.register(spark)` on a live session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"dot_product requires exactly 2 arguments, got ${args.length}")
        DotProduct(args(0), args(1))
      }),
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim requires exactly 2 arguments, got ${args.length}")
        CosineSim(args(0), args(1))
      }))

  /** Register all graft functions into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
