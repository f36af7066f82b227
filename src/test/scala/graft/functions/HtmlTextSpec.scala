package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → visible text extraction (the WARC→WET conversion step):
  * script/style dropping incl. multiline bodies, tag stripping, entity
  * decode ordering, whitespace collapse. */
class HtmlTextSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Text.htmlToText(col("h"))).as[String].head()

  test("tags strip, blocks drop, entities decode, whitespace collapses") {
    val html = """<html><head><title>T</title>
      |<style type="text/css">body { color: red; }
      |p { margin: 0; }</style></head>
      |<body><h1>Hello</h1>
      |<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p>
      |<script>
      |  var x = "<p>not text</p>";
      |</script>
      |<div>tail</div></body></html>""".stripMargin
    assert(extract(html) == "T Hello a & b <tag> \"q\" 's' end tail")
  }

  test("single-level decode in BOTH escape directions: &amp;lt; yields " +
      "'&lt;', &#38;amp; yields '&amp;' (no double decode either way)") {
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
    assert(extract("<p>&amp;#65;</p>") == "&#65;")
    // the inverse spelling: &#38; is '&', and the following 'amp;' must
    // stay literal — sequential replacement passes get this wrong
    assert(extract("<p>&#38;amp;</p>") == "&amp;")
    assert(extract("<p>&#38;lt;tag&#38;gt;</p>") == "&lt;tag&gt;")
  }

  test("NUMERIC character references decode: decimal, hex, supplementary " +
      "plane; malformed and escaped ones stay literal") {
    assert(extract("<p>a&#8212;b ok&#x21; A=&#65; &#x1F600;</p>") ==
      "a—b ok! A=A 😀")
    // &amp;#65; is an ESCAPED literal &#65; — single decode only
    assert(extract("<p>&amp;#65;</p>") == "&#65;")
    // malformed: no digits, unterminated, out of range, surrogate
    assert(extract("&#; &#xg1; &#1114112; &#xD800; &#65") ==
      "&#; &#xg1; &#1114112; &#xD800; &#65")
  }

  test("script with attributes and multiline body drops wholesale") {
    val html = "<script src=\"x.js\" async>\nif (a < b) { run(); }\n</script>ok"
    assert(extract(html) == "ok")
  }

  test("plain text passes through trimmed") {
    assert(extract("  just   text \n here ") == "just text here")
  }
}
