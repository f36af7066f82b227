package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → Markdown conversion: structural mapping, inline markers,
  * links/images, code fences, dirty-input degradation. */
class HtmlMarkdownSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def md(html: String): String =
    Seq(html).toDF("h").select(Text.htmlToMarkdown(col("h"))).as[String].head()

  test("headings, paragraphs, and hard breaks map to markdown structure") {
    val got = md("<h1>Title</h1><p>First para.</p><h2>Sub</h2>" +
      "<p>line one<br>line two</p>")
    assert(got ==
      "# Title\n\nFirst para.\n\n## Sub\n\nline one\nline two", got)
  }

  test("lists flatten to dash items on their own lines") {
    val got = md("<p>Intro:</p><ul><li>alpha</li><li>beta and more</li>" +
      "<li>gamma</li></ul><p>After.</p>")
    assert(got ==
      "Intro:\n\n- alpha\n- beta and more\n- gamma\n\nAfter.", got)
  }

  test("emphasis, code spans, links, and images keep inline shape") {
    val got = md("<p>a <b>bold</b> word, an <em>italic one</em>, " +
      "<code>x + 1</code>, a <a href=\"/doc\">doc link</a> and " +
      "<img src=\"/i.png\" alt=\"pic\"> end</p>")
    assert(got == "a **bold** word, an *italic one*, `x + 1`, " +
      "a [doc link](/doc) and ![pic](/i.png) end", got)
  }

  test("pre blocks fence raw content (inner <code> wrapper dropped, " +
      "whitespace preserved)") {
    val got = md("<p>Look:</p><pre><code>def f(x):\n    return x</code></pre>" +
      "<p>Done.</p>")
    assert(got ==
      "Look:\n\n```\ndef f(x):\n    return x\n```\n\nDone.", got)
  }

  test("script/style/comments drop; entities decode downstream; " +
      "whitespace collapses outside pre") {
    val got = md("<style>p{}</style><p>a &amp; b\n\n   c &#8212; d</p>" +
      "<script>x()</script><!-- note -->")
    assert(got == "a & b c — d", got)
  }

  test("dirty input never throws: unclosed emphasis degrades to a " +
      "literal marker, unterminated pre fences to the end, markup-free " +
      "input passes through") {
    assert(md("<p><b>bold start and no close</p>") ==
      "**bold start and no close")
    assert(md("<pre>raw to the end") == "```\nraw to the end\n```")
    assert(md("just words here") == "just words here")
    assert(md("five < six stays") == "five < six stays")
  }

  test("hr becomes a thematic break; unquoted attribute values parse") {
    val got = md("<p>a</p><hr><p>b <a href=/x>l</a></p>")
    assert(got == "a\n\n---\n\nb [l](/x)", got)
  }
}
