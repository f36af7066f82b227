package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two float-array columns,
  * accumulated left-to-right in double — bit-identical to the
  * `aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  * 0.0, _ + _)` formulation, but one tight JVM loop per row instead of
  * interpreted per-element closures (higher-order functions are
  * CodegenFallback). The embedding similarity hot path at corpus scale.
  *
  * Shorter-array semantics follow `zip_with`: the missing side is null,
  * null * x is null, and `acc + null` nulls the accumulation — so unequal
  * lengths yield null, which the parity spec pins.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vector_dot"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    VectorDot.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val boxed = ctx.freshName("dotBoxed")
    ev.copy(code =
      code"""
        ${lGen.code}
        ${rGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${lGen.isNull} && !${rGen.isNull}) {
          java.lang.Double $boxed = graft.expressions.VectorDot.compute(
            ${lGen.value}, ${rGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.doubleValue();
          }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorDot {
  /** Null when lengths differ (zip_with + null-propagating sum parity);
    * boxed Double otherwise. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
