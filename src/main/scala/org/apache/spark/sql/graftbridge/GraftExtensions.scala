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
  /** A 1-arg function built by composing native Columns (the text layer):
    * the composition is unfolded into a plain Expression tree at resolution,
    * so SQL callers get the same codegen'd plan the Scala API builds. */
  private def composed1(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
      new ExpressionInfo(GraftExtensions.getClass.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name requires exactly 1 argument, got ${args.length}")
        ColumnBridge.eagerExpression(f(ColumnBridge.column(args(0))))
      })

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
      }),
    composed1("graft_token_count", graft.functions.Text.tokenCount),
    composed1("graft_bpe_token_count", graft.functions.Text.bpeTokenCount),
    composed1("graft_lang_guess", graft.functions.Text.langGuess),
    composed1("graft_fingerprint", graft.functions.Text.fingerprint),
    composed1("graft_rolling_hash", graft.functions.Text.tokenRollingHash),
    composed1("graft_scrub_pii", graft.functions.Text.scrubPii))

  /** Register all graft functions into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
