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

  test("common NAMED entities decode (typography, marks, currency, " +
      "symbols, fractions); unknown names stay literal") {
    assert(extract("<p>&ldquo;hi&rdquo; &mdash; it&rsquo;s fine&hellip;</p>") ==
      "“hi” — it’s fine…")
    assert(extract("<p>&copy; 2024 X&trade; &reg; 5&deg; &middot; &bull;</p>") ==
      "© 2024 X™ ® 5° · •")
    assert(extract("<p>&euro;9 &pound;8 &yen;7 &cent;6 &plusmn;1 " +
      "&frac12;&times;2&divide;4 m&sup2; m&sup3;</p>") ==
      "€9 £8 ¥7 ¢6 ±1 ½×2÷4 m² m³")
    assert(extract("<p>&laquo;x&raquo; &sect;2 &para;3 &dagger; &Dagger; " +
      "&ndash; &lsquo;y&rsquo; &bdquo;z&ldquo; 5&prime;10&Prime;</p>") ==
      "«x» §2 ¶3 † ‡ – ‘y’ „z“ 5′10″")
    // one-level semantics hold for named refs too
    assert(extract("<p>&amp;mdash;</p>") == "&mdash;")
    assert(extract("<p>&#38;hellip;</p>") == "&hellip;")
    // the HTML5 long tail stays literal (dirty-input semantics)
    assert(extract("<p>&eacute; &notin; &alpha;</p>") ==
      "&eacute; &notin; &alpha;")
    // case matters: &Prime; is U+2033, &PRIME; is not a name
    assert(extract("<p>&PRIME;</p>") == "&PRIME;")
  }

  test("script with attributes and multiline body drops wholesale") {
    val html = "<script src=\"x.js\" async>\nif (a < b) { run(); }\n</script>ok"
    assert(extract(html) == "ok")
  }

  test("plain text passes through trimmed") {
    assert(extract("  just   text \n here ") == "just text here")
  }
}
