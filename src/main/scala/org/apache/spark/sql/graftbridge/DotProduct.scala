package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/**
 * Sequential-order dot product over two `array<double>` / `array<float>`
 * columns as a native Catalyst expression WITH whole-stage codegen.
 *
 * Why this exists: Spark's higher-order functions (`aggregate`, `zip_with`,
 * `transform`) are evaluated interpreted — fine per row, ruinous inside an
 * LSH-bucket verify join touching millions of candidate pairs, or when a
 * signature pass projects a vector against dozens of hyperplanes. This
 * compiles to a tight primitive loop (`acc += a[i]*b[i]`), keeping similarity
 * work inside WholeStageCodegen.
 *
 * Float inputs are widened per element (exact), so `dot(float_vec, x)` is
 * bit-identical to `dot(cast(float_vec as array<double>), x)` — and therefore
 * to DuckDB's `list_dot_product(CAST(v AS DOUBLE[]), ...)`, which is what the
 * oracle hash-compare relies on. Accumulation order is ascending index.
 *
 * Malformed-data semantics (documented divergence from DuckDB, which ERRORS
 * on mismatched list lengths): mismatched arrays truncate to the shorter
 * length, and null ELEMENTS read as 0.0. Callers feeding heterogeneous or
 * null-holed vectors get silently degraded similarities — validate upstream
 * if that matters (the graft pipelines produce fixed-dim non-null vectors).
 *
 * (Lives in an `org.apache.spark.sql` subpackage because `AbstractDataType`
 * / `ExpectsInputTypes` are private[sql]; same access pattern as Spark
 * connector libraries.)
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
        TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names per instance: several DotProducts can share one generated
      // method scope (e.g. cosine() = three in one projection) and fixed local
      // names would collide -> Janino failure -> silent interpreted fallback
      val n = ctx.freshName("dotN")
      val acc = ctx.freshName("dotAcc")
      val i = ctx.freshName("dotI")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getA * $getB;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
