package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: RFC 9309 robots.txt PATH-PATTERN match —
  * does `pattern` match URL `path`? Patterns are PREFIX matches with
  * two special octets: `*` matches any character sequence (including
  * empty) and `$` at the pattern END anchors the full path; a `$`
  * anywhere else is literal. Iterative greedy match with single-star
  * backtracking (the classic glob walk) — no per-row regex compile,
  * no catastrophic backtracking. Codegen'd via the static
  * [[RobotsMatch.matches]]. */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def prettyName: String = "robots_match"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string path, string pattern), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override protected def nullSafeEval(path: Any, pattern: Any): Any =
    RobotsMatch.matches(path.asInstanceOf[UTF8String],
      pattern.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, q) =>
      s"graft.expressions.RobotsMatch.matches($p, $q)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsMatch =
    copy(left = newLeft, right = newRight)
}

object RobotsMatch {

  def matches(pathU: UTF8String, patternU: UTF8String): Boolean = {
    val path = pathU.toString
    var pat = patternU.toString
    val anchored = pat.nonEmpty && pat.charAt(pat.length - 1) == '$'
    if (anchored) pat = pat.substring(0, pat.length - 1)
    // greedy glob walk: i over path, j over pattern; on mismatch,
    // backtrack to the last '*' and let it swallow one more char
    var i = 0
    var j = 0
    var starJ = -1
    var starI = -1
    val n = path.length
    val m = pat.length
    while (i < n && j <= m) {
      if (j < m && pat.charAt(j) == '*') { starJ = j; starI = i; j += 1 }
      else if (j < m && path.charAt(i) == pat.charAt(j)) { i += 1; j += 1 }
      else if (j == m && !anchored) return true // prefix consumed
      else if (starJ >= 0) { starI += 1; i = starI; j = starJ + 1 }
      else return false
    }
    // path exhausted: remaining pattern must be all '*'
    while (j < m && pat.charAt(j) == '*') j += 1
    j == m && (!anchored || i == n)
  }
}
