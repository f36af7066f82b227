package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: argmin-over-centroids assignment for
  * k-means — `argmin_i (|c_i|² − 2·q·c_i)` (the row-constant |q|² cancels;
  * ties break on the LOWER index).
  *
  * Exists because the composed form — `array_min(array(struct(score,
  * idx), …))` with one [[VectorDot]] per centroid — builds a k-wide
  * expression TREE: at SemDeDup's production k (k ∝ corpus / a few
  * hundred, easily 10²-10³) the tree blows past codegen limits and the
  * whole projection drops to interpreted eval, turning the linear
  * O(n·k·d) assignment into the job's bottleneck. Here the k×d centroid
  * matrix rides ONE broadcast-referenced flat array and the argmin is a
  * tight two-level JVM loop — codegen'd with constant code size in k.
  *
  * Bit-parity with the composed form (pinned by spec): per-centroid
  * `c2 − 2.0·dot` with `c2` and `dot` both accumulated left-to-right in
  * double over float inputs; strict `<` comparison (first minimum wins —
  * the lexicographic struct-min tie-break); a length-mismatched or
  * NaN-scoring row keeps the lowest candidate index, matching the
  * struct-min's null/NaN-last ordering. */
case class NearestCentroid(child: Expression, model: NearestCentroid.Model)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float> input, got ${t.catalogString}")
  }

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else java.lang.Integer.valueOf(model.assign(v.asInstanceOf[ArrayData]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("ncModel", model,
      classOf[NearestCentroid.Model].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $modelRef.assign($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Flat k×d centroid matrix + per-centroid |c|², shipped once per task
    * via the codegen reference array (not re-serialized per row). */
  final class Model(val flat: Array[Float], val d: Int) extends Serializable {
    require(d > 0 && flat.length % d == 0,
      s"centroid matrix length ${flat.length} is not a multiple of d=$d")
    val k: Int = flat.length / d
    // |c|² accumulated left-to-right in double — identical to the
    // composed form's foldLeft
    val c2: Array[Double] = Array.tabulate(k) { ci =>
      var acc = 0.0
      var j = 0
      while (j < d) { acc += flat(ci * d + j).toDouble * flat(ci * d + j).toDouble; j += 1 }
      acc
    }

    def assign(q: ArrayData): Int = {
      if (q.numElements() != d) return 0 // all scores null → lowest index
      var best = Double.PositiveInfinity
      var bestIdx = 0
      var ci = 0
      while (ci < k) {
        var dot = 0.0
        var j = 0
        val off = ci * d
        while (j < d) { dot += q.getFloat(j).toDouble * flat(off + j).toDouble; j += 1 }
        val s = c2(ci) - 2.0 * dot
        if (s < best) { best = s; bestIdx = ci }
        ci += 1
      }
      bestIdx
    }
  }

  def model(centroids: Seq[Seq[Float]]): Model = {
    require(centroids.nonEmpty, "NearestCentroid needs at least one centroid")
    val d = centroids.head.length
    require(centroids.forall(_.length == d),
      "all centroids must share one dimensionality")
    new Model(centroids.flatten.toArray, d)
  }
}
