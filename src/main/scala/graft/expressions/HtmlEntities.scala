package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: decode HTML character references in ONE
  * left-to-right scan — NUMERIC (`&#NNNN;` decimal, `&#xHH;` hex) and
  * the six core NAMED entities (`&amp; &lt; &gt; &quot; &nbsp;` — plus
  * `&apos;`). Both kinds are ubiquitous in crawl HTML, and a pipeline
  * that passes them through as literal text corrupts token counts,
  * dedup shingles, and the curated corpus itself.
  *
  * A regex chain can find references but `regexp_replace` cannot
  * COMPUTE a numeric replacement (chr of a captured number) — and,
  * worse, SEQUENTIAL replacement passes double-decode whichever
  * spelling runs second (`&amp;#65;` under numeric-after-amp;
  * `&#38;amp;` under amp-after-numeric). A single scan that consumes
  * each source reference exactly once and never re-reads its own
  * output is immune in BOTH directions: `&amp;#65;` → `&#65;` and
  * `&#38;amp;` → `&amp;`, each decoded exactly one level, matching
  * browser semantics. That makes this genuine native-expression
  * territory: one pass per row, inside whole-stage codegen via the
  * static [[HtmlNumericEntityDecode.compute]].
  *
  * Out-of-range (> U+10FFFF), surrogate-range, and malformed references
  * (no digits, no terminating `;` within bounds, unknown names) stay
  * literal — crawl bytes are dirty by definition and decode must never
  * throw. Supplementary-plane references emit surrogate pairs
  * (`Character.toChars`). */
case class HtmlNumericEntityDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "html_numeric_entity_decode"

  override protected def nullSafeEval(input: Any): Any =
    HtmlNumericEntityDecode.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HtmlNumericEntityDecode.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlNumericEntityDecode =
    copy(child = newChild)
}

object HtmlNumericEntityDecode {

  /** Longest reference accepted: `&#` + 7 digits + `;` (10FFFF is 7
    * decimal digits: 1114111). Longer runs are left literal. */
  private val MaxDigits = 7

  /** The core named entities (XML five + the two every crawl page
    * carries). Sorted check is unnecessary at this size — a linear
    * probe over 7 entries is branch-predictable. */
  private val Named: Array[(String, Char)] = Array(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"',
    "apos" -> '\'', "nbsp" -> ' ')

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    // fast path: no '&' → no work, return the input object untouched
    if (s.indexOf('&') < 0) return input
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&' && i + 2 < n && s.charAt(i + 1) == '#') {
        var j = i + 2
        val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
        if (hex) j += 1
        val digStart = j
        var cp = 0L
        var ok = true
        while (j < n && ok && s.charAt(j) != ';' && j - digStart <= MaxDigits) {
          val d = s.charAt(j)
          val v =
            if (d >= '0' && d <= '9') d - '0'
            else if (hex && d >= 'a' && d <= 'f') d - 'a' + 10
            else if (hex && d >= 'A' && d <= 'F') d - 'A' + 10
            else -1
          if (v < 0) ok = false
          else { cp = cp * (if (hex) 16 else 10) + v; j += 1 }
        }
        ok = ok && j < n && s.charAt(j) == ';' && j > digStart &&
          cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)
        if (ok) {
          sb.append(Character.toChars(cp.toInt))
          i = j + 1
        } else { sb.append(c); i += 1 }
      } else if (c == '&') {
        // named entity: &name; — consumed exactly once, unknown names
        // stay literal
        var hit = -1
        var k = 0
        while (hit < 0 && k < Named.length) {
          val name = Named(k)._1
          val end = i + 1 + name.length
          if (end < n && s.charAt(end) == ';' &&
              s.regionMatches(i + 1, name, 0, name.length)) hit = k
          k += 1
        }
        if (hit >= 0) {
          sb.append(Named(hit)._2)
          i = i + 2 + Named(hit)._1.length
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
