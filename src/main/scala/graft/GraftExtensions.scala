package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expressions.{MinHashSignature, ShinglePairHashes, SimHash64Expr, SrpBucketExpr, VectorDot}

/** SparkSessionExtensions entry point: registers graft's native expressions
  * as SQL functions so `spark.sql` users get the same codegen'd hot paths
  * as the Scala API.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  *
  *  - `shingle_pair_hashes(text, n)` → array<struct<a,b>> distinct word
  *    n-gram hashes ([[graft.expressions.ShinglePairHashes]])
  *  - `vector_dot(a, b)` → double ([[graft.expressions.VectorDot]])
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private[graft] val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("shingle_pair_hashes"),
      new ExpressionInfo(classOf[ShinglePairHashes].getName, "shingle_pair_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "shingle_pair_hashes(text, n) takes exactly 2 arguments")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"shingle_pair_hashes: n must be an integer literal, got $other")
        }
        ShinglePairHashes(children.head, n)
      }),
    (new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot(a, b) takes exactly 2 arguments")
        VectorDot(children.head, children(1))
      }),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64Expr].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "simhash64(text) takes exactly 1 argument")
        SimHash64Expr(children.head)
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "minhash_signature(text, n, numHashes) takes exactly 3 arguments")
        val Seq(n, numHashes) = children.drop(1).map {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature: n/numHashes must be integer literals, got $other")
        }
        MinHashSignature(children.head, n, numHashes)
      }),
    (new FunctionIdentifier("srp_bucket"),
      new ExpressionInfo(classOf[SrpBucketExpr].getName, "srp_bucket"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "srp_bucket(vec, dim, nBits) takes exactly 3 arguments")
        val Seq(dim, nBits) = children.drop(1).map {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"srp_bucket: dim/nBits must be integer literals, got $other")
        }
        SrpBucketExpr(children.head, dim, nBits)
      }))

  /** Register on an already-built session (extensions only apply at build
    * time; this covers notebook/REPL sessions that already exist). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.graftbridge.ColumnBridge
        .registerFunction(spark, id, info, builder)
    }
}
