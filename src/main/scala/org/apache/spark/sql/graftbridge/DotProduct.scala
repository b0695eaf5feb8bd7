package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/**
 * Sequential-order dot product over two `array<double>` columns as a native
 * Catalyst expression WITH whole-stage codegen.
 *
 * Why this exists: Spark's higher-order functions (`aggregate`, `zip_with`)
 * are evaluated interpreted — fine per row, ruinous inside an LSH-bucket
 * verify join touching millions of candidate pairs. This compiles to a tight
 * primitive loop (`acc += a[i]*b[i]`), keeping similarity verification inside
 * WholeStageCodegen.
 *
 * Accumulation order is ascending index, so results are bit-identical to both
 * the `aggregate(zip_with(...))` formulation and DuckDB's `list_dot_product`
 * — which is what the oracle hash-compare relies on.
 *
 * (Lives in an `org.apache.spark.sql` subpackage because `AbstractDataType`
 * / `ExpectsInputTypes` are private[sql]; same access pattern as Spark
 * connector libraries.)
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int graftN = java.lang.Math.min($a.numElements(), $b.numElements());
         |double graftAcc = 0.0;
         |for (int graftI = 0; graftI < graftN; graftI++) {
         |  graftAcc += $a.getDouble(graftI) * $b.getDouble(graftI);
         |}
         |${ev.value} = graftAcc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
