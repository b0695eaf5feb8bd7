package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/**
 * Single-pass cosine similarity `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`
 * as one codegen'd loop: all three accumulators advance together, so each
 * array is traversed ONCE instead of the three passes the composed
 * `dot/dot/dot` formulation costs (and CSE cannot merge those loops).
 *
 * Each accumulator is an independent ascending-index sum, so the result is
 * bit-identical to composing [[DotProduct]]s — and therefore to the DuckDB
 * oracle formula. Zero-norm inputs yield 0.0 (NOT the raw 0/0 NaN, which
 * Spark SQL would order above every number). Float elements widen exactly.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
        TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.min(nx, ny)
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dab += xi * yi; daa += xi * xi; dbb += yi * yi
      i += 1
    }
    // norms run over each FULL array (the composed dot(a,a)/dot(b,b) form
    // does), so mismatched lengths stay bit-identical to composition
    while (i < nx) { val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i); daa += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i); dbb += yi * yi; i += 1 }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) 0.0 else dab / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("cosN")
      val i = ctx.freshName("cosI")
      val dab = ctx.freshName("cosDab")
      val daa = ctx.freshName("cosDaa")
      val dbb = ctx.freshName("cosDbb")
      val xi = ctx.freshName("cosXi")
      val yi = ctx.freshName("cosYi")
      val denom = ctx.freshName("cosDenom")
      val nx = ctx.freshName("cosNx")
      val ny = ctx.freshName("cosNy")
      val getA = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getB = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |int $i = 0;
         |for (; $i < $n; $i++) {
         |  double $xi = $getA;
         |  double $yi = $getB;
         |  $dab += $xi * $yi; $daa += $xi * $xi; $dbb += $yi * $yi;
         |}
         |for (; $i < $nx; $i++) { double $xi = $getA; $daa += $xi * $xi; }
         |for ($i = $n; $i < $ny; $i++) { double $yi = $getB; $dbb += $yi * $yi; }
         |double $denom = java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb);
         |${ev.value} = ($denom == 0.0) ? 0.0 : $dab / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
