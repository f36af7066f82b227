package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: MAIN-CONTENT extraction — the
  * boilerplate-removal step every production crawl pipeline runs
  * between raw HTML and quality filtering, so nav bars, cookie
  * banners, and footers never reach token counts, dedup shingles, or
  * the corpus. [[graft.functions.Text.htmlToText]] keeps ALL visible
  * text (the WET shape); this keeps only the content blocks (the
  * trafilatura/readability shape), plugging in at the column position
  * htmlToText's scaladoc reserves for it.
  *
  * The recipe is the block-scoring classifier of the boilerplate-
  * detection literature (shallow text features per block: word count
  * and link density), reduced to FIXED published-style thresholds so
  * the decision is deterministic and an oracle can state the expected
  * output closed-form:
  *
  *  1. one left-to-right scan segments the document into BLOCKS at
  *     block-level tag boundaries (`p div h1-h6 li ul ol dl table tr
  *     td th section article main header footer nav aside blockquote
  *     pre form br hr body title`); inline tags (`a b i span em ...`)
  *     do not split;
  *  2. `script` / `style` / comment content is dropped wholesale;
  *  3. per block, words = whitespace-separated runs of its visible
  *     text; link words = words inside `<a>` spans (anchor depth
  *     tracked across inline tags);
  *  4. a block is CONTENT iff words >= 10 AND link words <= words/3
  *     (link density <= 1/3) — short blocks and link-dense blocks
  *     (navigation, pagination, footers, cookie banners) drop;
  *  5. GAP FILL (the standard second pass of the block-classifier
  *     recipe — trafilatura/jusText's "short-between-good" rule): a
  *     block that failed ONLY the word-count gate (words >= 1, link
  *     density still <= 1/3) is PROMOTED when its immediate non-empty
  *     neighbors on BOTH sides are primary content — paragraph-
  *     fragmented articles keep their short bridge sentences.
  *     Promotion reads primary verdicts only (no cascade), so the
  *     output stays closed-form;
  *  6. kept blocks join with '\n', raw character references intact
  *     (compose [[HtmlNumericEntityDecode]] downstream, exactly like
  *     htmlToText).
  *
  * Crawl bytes are dirty by definition: unclosed tags, stray '<',
  * attributes with quoted '>', nested anchors, and truncation all
  * degrade to text — extraction never throws. Input with no markup is
  * a single block under the same thresholds. Per-row single pass,
  * whole-stage codegen via the static [[HtmlMainContent.compute]]. */
case class HtmlMainContent(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def prettyName: String = "html_main_content"

  override protected def nullSafeEval(input: Any): Any =
    HtmlMainContent.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HtmlMainContent.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlMainContent =
    copy(child = newChild)
}

object HtmlMainContent {

  /** Content gate: at least this many words... */
  private val MinWords = 10
  /** ...and at most words/LinkDensityDiv of them inside anchors. */
  private val LinkDensityDiv = 3

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "dl", "dt", "dd", "table", "tr", "td", "th", "thead", "tbody",
      "section", "article", "main", "header", "footer", "nav", "aside",
      "blockquote", "pre", "form", "br", "hr", "body", "head", "title",
      "figure", "figcaption").foreach(s.add)
    s
  }

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    // collected non-empty blocks: (trimmed text, words, link words)
    val blocks =
      new java.util.ArrayList[(String, Int, Int)]()
    val block = new java.lang.StringBuilder
    var blockWords = 0
    var blockLinkWords = 0
    var inWord = false
    var wordHasLink = false
    var linkDepth = 0

    def endWord(): Unit = {
      if (inWord) {
        blockWords += 1
        if (wordHasLink) blockLinkWords += 1
        inWord = false; wordHasLink = false
      }
    }
    def flush(): Unit = {
      endWord()
      // anchors don't survive block boundaries: crawl HTML is full of
      // unclosed <a> tags (nav markup especially), and a dangling
      // linkDepth would mark EVERY later word a link word and sink all
      // remaining content on the density gate. Block-scoped anchor
      // state loses only the rare legal anchor-wrapping-blocks case
      // (card links), whose blocks are short and drop on MinWords.
      linkDepth = 0
      // trim the block's own edges; internal whitespace is the
      // caller's collapse stage's business. Empty blocks vanish here
      // (every tag pair makes boundaries) — gap-fill adjacency is over
      // blocks that HOLD text.
      var a = 0; var b = block.length
      while (a < b && block.charAt(a) <= ' ') a += 1
      while (b > a && block.charAt(b - 1) <= ' ') b -= 1
      if (b > a)
        blocks.add((block.substring(a, b), blockWords, blockLinkWords))
      block.setLength(0); blockWords = 0; blockLinkWords = 0
    }
    /** Position just past the closing '>' of the tag starting at `lt`
      * (single-quoted and double-quoted attribute values may contain
      * '>'); n when unterminated. */
    def tagEnd(lt: Int): Int = {
      var j = lt + 1
      while (j < n && s.charAt(j) != '>') {
        val c = s.charAt(j)
        if (c == '"' || c == '\'') {
          j += 1
          while (j < n && s.charAt(j) != c) j += 1
        }
        j += 1
      }
      math.min(n, j + 1)
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && i + 1 < n &&
          (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
        // comment / doctype / processing instruction
        if (s.regionMatches(i + 1, "!--", 0, 3)) {
          val close = s.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else i = tagEnd(i)
      } else if (c == '<' && i + 1 < n &&
          (Character.isLetter(s.charAt(i + 1)) || s.charAt(i + 1) == '/')) {
        val closing = s.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
        val name = s.substring(nameStart, j).toLowerCase
        i = tagEnd(i)
        if (!closing && (name == "script" || name == "style")) {
          // drop content wholesale up to the matching close tag
          val close = s"</$name"
          val k = indexOfIgnoreCase(s, close, i)
          i = if (k < 0) n else tagEnd(k)
        } else if (name == "a") {
          // a word boundary like any other inline tag — 'more<a>here'
          // must not glue into one (link-tainted) word
          endWord()
          block.append(' ')
          if (closing) linkDepth = math.max(0, linkDepth - 1)
          else linkDepth += 1
        } else if (BlockTags.contains(name)) {
          flush()
        } else {
          // inline tag: a word boundary, but not a block boundary
          endWord()
          block.append(' ')
        }
      } else if (c == '<') {
        // stray '<' in text: literal
        block.append(c)
        if (!inWord) { inWord = true; wordHasLink = linkDepth > 0 }
        else if (linkDepth > 0) wordHasLink = true
        i += 1
      } else {
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\u000B'
            || c == '\f') endWord()
        else {
          if (!inWord) { inWord = true; wordHasLink = linkDepth > 0 }
          else if (linkDepth > 0) wordHasLink = true
        }
        block.append(c)
        i += 1
      }
    }
    flush()
    // classification + gap fill over the collected blocks
    val m = blocks.size()
    val primary = new Array[Boolean](m)
    var bi = 0
    while (bi < m) {
      val (_, w, lw) = blocks.get(bi)
      primary(bi) = w >= MinWords && lw * LinkDensityDiv <= w
      bi += 1
    }
    val out = new java.lang.StringBuilder
    bi = 0
    while (bi < m) {
      val (text, w, lw) = blocks.get(bi)
      val promoted = !primary(bi) && w >= 1 &&
        lw * LinkDensityDiv <= w &&
        bi > 0 && bi + 1 < m && primary(bi - 1) && primary(bi + 1)
      if (primary(bi) || promoted) {
        if (out.length > 0) out.append('\n')
        out.append(text)
      }
      bi += 1
    }
    UTF8String.fromString(out.toString)
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = math.max(0, from)
    while (i + m <= n) {
      if (s.regionMatches(true, i, needle, 0, m)) return i
      i += 1
    }
    -1
  }
}
