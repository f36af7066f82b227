package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: out-link extraction + RFC 3986 §5
  * resolution of an HTML page against its URL — ONE per-row pass with
  * compiled-once patterns, because the column-level composition
  * (regexp_extract_all + a transform lambda re-resolving per element)
  * is a 10-26× slowdown on the link-graph board: higher-order lambdas
  * are CodegenFallback, and every regex in the lambda body runs per
  * link.
  *
  * Semantics (pinned by WebSpec + the q200/q205 oracles, identical to
  * the column composition it replaces):
  *
  *  - `<a href>` values: double-quoted, single-quoted, or unquoted;
  *  - the FIRST `<base href>` — itself resolved against the page URL —
  *    becomes the base for every link (HTML spec); non-resolvable
  *    values fall back to the page URL;
  *  - fragments TRIM; pure-fragment and empty hrefs DROP; hrefs
  *    entity-decode ([[HtmlNumericEntityDecode.compute]]);
  *  - http(s) absolute kept, other schemes (mailto:, javascript:)
  *    DROP, scheme-relative / root-relative / query-only /
  *    path-relative resolve against the base parts;
  *  - every resolved URL's path is dot-segment normalized
  *    ([[RemoveDotSegments.normalize]]).
  *
  * Returns `array<string>`; per-row, no shuffle, whole-stage codegen
  * via the static [[ExtractLinks.compute]]. */
case class ExtractLinks(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string html, string baseUrl), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "extract_links"

  override protected def nullSafeEval(html: Any, base: Any): Any =
    ExtractLinks.compute(html.asInstanceOf[UTF8String],
      base.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, b) =>
      s"graft.expressions.ExtractLinks.compute($h, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ExtractLinks =
    copy(left = newLeft, right = newRight)
}

object ExtractLinks {

  private val HrefVal = "href=(\"[^\"]*\"|'[^']*'|[^\\s>\"']+)"
  private val AHref =
    java.util.regex.Pattern.compile("(?i)<a\\s[^>]*" + HrefVal)
  private val BaseHref =
    java.util.regex.Pattern.compile("(?i)<base\\s[^>]*" + HrefVal)

  /** (scheme, origin, dir, basePath) of an absolute URL; null when the
    * input has no `scheme://`. */
  private final class Parts(u: String) {
    var ok = false
    var scheme: String = ""
    var origin: String = ""
    var dir: String = ""
    var basePath: String = ""
    locally {
      val n = u.length
      if (n > 0 && Character.isLetter(u.charAt(0))) {
        var i = 1
        while (i < n && (Character.isLetterOrDigit(u.charAt(i)) ||
          u.charAt(i) == '+' || u.charAt(i) == '.' || u.charAt(i) == '-')) i += 1
        if (i + 2 < n && u.charAt(i) == ':' && u.charAt(i + 1) == '/' &&
            u.charAt(i + 2) == '/') {
          scheme = u.substring(0, i)
          var h = i + 3
          while (h < n && u.charAt(h) != '/' && u.charAt(h) != '?' &&
            u.charAt(h) != '#') h += 1
          origin = u.substring(0, h)
          var p = h
          while (p < n && u.charAt(p) != '?' && u.charAt(p) != '#') p += 1
          val path = u.substring(h, p)
          val lastSlash = path.lastIndexOf('/')
          dir =
            if (lastSlash >= 0) origin + path.substring(0, lastSlash + 1)
            else origin + "/"
          basePath = if (path.isEmpty) origin + "/" else origin + path
          ok = true
        }
      }
    }
  }

  private def stripQuotes(t: String): String =
    if (t.length >= 2 && (t.charAt(0) == '"' || t.charAt(0) == '\''))
      t.substring(1, t.length - 1)
    else t

  private def dropFragment(t: String): String = {
    val h = t.indexOf('#')
    if (h < 0) t else t.substring(0, h)
  }

  private def entityDecode(t: String): String =
    if (t.indexOf('&') < 0) t
    else HtmlNumericEntityDecode.compute(UTF8String.fromString(t)).toString

  private def isHttpAbsolute(h: String): Boolean = {
    val l = h.length
    (l >= 7 && h.regionMatches(true, 0, "http://", 0, 7)) ||
      (l >= 8 && h.regionMatches(true, 0, "https://", 0, 8))
  }

  private def hasScheme(h: String): Boolean = {
    if (h.isEmpty || !Character.isLetter(h.charAt(0))) return false
    var i = 1
    val n = h.length
    while (i < n) {
      val c = h.charAt(i)
      if (c == ':') return true
      if (!(Character.isLetterOrDigit(c) || c == '+' || c == '.' || c == '-'))
        return false
      i += 1
    }
    false
  }

  /** Dot-segment-normalize the path portion of an absolute URL. */
  private def normalizePath(u: String): String = {
    // find end of authority
    val ss = u.indexOf("://")
    if (ss < 0) return u
    var h = ss + 3
    val n = u.length
    while (h < n && u.charAt(h) != '/' && u.charAt(h) != '?' &&
      u.charAt(h) != '#') h += 1
    var p = h
    while (p < n && u.charAt(p) != '?' && u.charAt(p) != '#') p += 1
    if (p == h) return u // no path
    val path = u.substring(h, p)
    if (path.indexOf('.') < 0) return u
    val norm = RemoveDotSegments
      .normalize(UTF8String.fromString(path)).toString
    if (norm == path) u else u.substring(0, h) + norm + u.substring(p)
  }

  private def resolve(h: String, base: Parts): String = {
    if (h.isEmpty) null
    else if (isHttpAbsolute(h)) normalizePath(h)
    else if (h.startsWith("//")) normalizePath(base.scheme + ":" + h)
    else if (hasScheme(h)) null // mailto:, javascript:, tel:, data:
    else if (h.charAt(0) == '/') normalizePath(base.origin + h)
    else if (h.charAt(0) == '?') base.basePath + h
    else normalizePath(base.dir + h)
  }

  def compute(htmlU: UTF8String, baseUrlU: UTF8String): GenericArrayData = {
    val html = htmlU.toString
    val pageUrl = baseUrlU.toString
    val pageParts = new Parts(pageUrl)
    // effective base: first <base href> resolved against the page
    var effUrl = if (pageParts.ok) normalizePath(pageUrl) else pageUrl
    if (pageParts.ok) {
      val bm = BaseHref.matcher(html)
      if (bm.find()) {
        val raw = entityDecode(dropFragment(stripQuotes(bm.group(1))))
        val r = resolve(raw, pageParts)
        if (r != null) effUrl = normalizePath(r)
      }
    }
    val base = if (effUrl eq pageUrl) pageParts else new Parts(effUrl)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val m = AHref.matcher(html)
    while (m.find()) {
      val raw = entityDecode(dropFragment(stripQuotes(m.group(1))))
      val r =
        if (base.ok) resolve(raw, base)
        else if (isHttpAbsolute(raw)) normalizePath(raw)
        else null // relative links against a non-absolute page URL drop
      if (r != null) out += UTF8String.fromString(r)
    }
    new GenericArrayData(out.toArray)
  }
}
