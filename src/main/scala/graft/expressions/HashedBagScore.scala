package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: hashed bag-of-words LINEAR score — the
  * inference half of a fastText-style quality classifier (the
  * CCNet/LLaMA-pipeline "keep if the quality model likes it" stage).
  * Per whitespace token: `bucket = xxhash64(token) mod dim` (Spark's
  * xxhash64 over UTF-8 bytes, seed 42 — so a DuckDB oracle replays the
  * bucketing with the repo's XXH64 SQL), accumulate the bucket's
  * INTEGER micro-unit weight; the row's score is the exact BIGINT sum.
  *
  * Integer micro-units instead of floats for the same reason the
  * PageRank family uses them: the keep decision
  * `sum >= threshold × n_tokens` (mean-weight form — fastText averages
  * features) is then engine-exact, so the whole classifier gates
  * against a closed-form oracle with zero float tolerance.
  *
  * The weight table rides the codegen reference array (the
  * [[NearestCentroid.Model]] pattern): shipped once per task, never
  * per row. One pass per row, no token array materialized. */
case class HashedBagScore(child: Expression, model: HashedBagScore.Model)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "hashed_bag_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else java.lang.Long.valueOf(model.score(v.asInstanceOf[UTF8String]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hbsModel", model,
      classOf[HashedBagScore.Model].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.score($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBagScore =
    copy(child = newChild)
}

object HashedBagScore {

  /** Micro-unit weight table; `weights.length` is the hash dimension. */
  final class Model(val weights: Array[Long]) extends Serializable {
    require(weights.nonEmpty, "empty weight table")
    private val dim = weights.length

    def score(text: UTF8String): Long = {
      val s = text.toString
      var sum = 0L
      var i = 0
      val n = s.length
      while (i < n) {
        // Java-regex \s semantics, matching Text.tokens' split("\\s+")
        while (i < n && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < n && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val tok = UTF8String.fromString(s.substring(start, i))
          val h = XXH64.hashUnsafeBytes(
            tok.getBaseObject, tok.getBaseOffset, tok.numBytes(), 42L)
          sum += weights(java.lang.Math.floorMod(h, dim.toLong).toInt)
        }
      }
      sum
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
        c == '\f' || c == '\r'
  }
}
