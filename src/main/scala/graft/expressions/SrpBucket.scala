package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: sign-random-projection LSH bucket id of a
  * float-vector column — `nBits` deterministic ±1 hyperplanes (splitmix64
  * finalizer of (plane, dimIdx)), bucket = bit pattern of projection signs.
  *
  * Bit-identical to the composed formulation in `Similarity.srpBucket`
  * (nBits interpreted `aggregate(zip_with(...))` passes per row), but one
  * multiply-add loop per row inside whole-stage codegen: projections
  * accumulate left-to-right in double, a strictly positive projection sets
  * the plane's bit, and a vector whose length differs from `dim` yields
  * bucket 0 (zip_with's null-propagation parity).
  */
case class SrpBucketExpr(child: Expression, dim: Int, nBits: Int)
    extends UnaryExpression {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1, 63], got $nBits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "srp_bucket"

  override protected def nullSafeEval(input: Any): Any =
    SrpBucketExpr.compute(input.asInstanceOf[ArrayData], dim, nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.SrpBucketExpr.compute($c, $dim, $nBits)")

  override protected def withNewChildInternal(newChild: Expression): SrpBucketExpr =
    copy(child = newChild)
}

object SrpBucketExpr {

  /** Deterministic ±1 hyperplane component — splitmix64 finalizer of
    * (plane, i); identical on driver and executors across JVMs (public
    * textbook mixer, same family as Multimodal/Similarity). */
  def planeSign(plane: Int, i: Int): Double = {
    var z = (plane.toLong << 32) | (i.toLong & 0xffffffffL)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Sign tables are deterministic per (nBits, dim): build once per JVM
    * rather than re-mixing splitmix per row element. */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(dim: Int, nBits: Int): Array[Array[Double]] =
    signCache.computeIfAbsent((nBits, dim), _ =>
      Array.tabulate(nBits, dim)((plane, i) => planeSign(plane, i)))

  def compute(vec: ArrayData, dim: Int, nBits: Int): Long = {
    if (vec.numElements() != dim) return 0L // zip_with null-propagation parity
    // a null ELEMENT nulls every projection in the HOF formulation → all
    // bits fall to the otherwise(0) branch → bucket 0; getFloat would
    // silently read it as 0.0f and fabricate a real bucket
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return 0L
      j += 1
    }
    val tbl = signs(dim, nBits)
    var out = 0L
    var plane = 0
    while (plane < nBits) {
      val row = tbl(plane)
      var acc = 0.0
      var i = 0
      while (i < dim) {
        acc += vec.getFloat(i).toDouble * row(i)
        i += 1
      }
      if (acc > 0) out |= 1L << plane
      plane += 1
    }
    out
  }
}
