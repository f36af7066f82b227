package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Main-content extraction (boilerplate removal): block segmentation,
  * word-count and link-density gates, dirty-input tolerance. */
class MainContentSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Text.mainContent(col("h"))).as[String].head()

  private val page =
    """<html><head><title>My Site</title><style>p{c:red}</style></head>
      |<body>
      |<div class="nav"><a href="/">Home</a> <a href="/a">About</a>
      |  <a href="/c">Contact</a> <a href="/l">Login</a></div>
      |<div class="cookie-banner">We use cookies; see our
      |  <a href="/p">policy</a> or <a href="/s">settings</a>.</div>
      |<article>
      |<p>The first paragraph of the story has plenty of words and
      |carries the actual content a reader came for, with a single
      |<a href="/ref">reference link</a> inline that must not sink it.</p>
      |<p>The second paragraph continues the main content with enough
      |words to clear the block threshold comfortably.</p>
      |</article>
      |<div class="pagination"><a href="/1">1</a> <a href="/2">2</a>
      |  <a href="/3">3</a> <a href="/4">next</a></div>
      |<div class="footer"><a href="/t">Terms</a> <a href="/pr">Privacy</a>
      |  <a href="/si">Sitemap</a> © 2024</div>
      |<script>track("everything");</script>
      |</body></html>""".stripMargin

  test("nav, cookie banner, pagination, footer, script DROP; the two " +
      "content paragraphs survive (inline link included)") {
    val got = extract(page)
    assert(got.startsWith("The first paragraph of the story"), got)
    assert(got.contains("reference link inline that must not sink it"), got)
    assert(got.endsWith("clear the block threshold comfortably."), got)
    for (bp <- Seq("Home", "About", "cookies", "Terms", "Privacy",
        "next", "track", "My Site"))
      assert(!got.contains(bp), s"boilerplate '$bp' leaked: $got")
  }

  test("link density: a long block that is mostly links drops; the same " +
      "text without anchors survives") {
    val words = (1 to 12).map(i => s"<a href='/$i'>w$i</a>").mkString(" ")
    assert(extract(s"<p>$words</p>") == "")
    val plain = (1 to 12).map(i => s"w$i").mkString(" ")
    assert(extract(s"<p>$plain</p>") == plain)
    // exactly at the 1/3 boundary: 12 words, 4 link words KEEPS
    val third = "<p>" + (1 to 8).map(i => s"w$i").mkString(" ") +
      " <a href='/x'>l1 l2 l3 l4</a></p>"
    assert(extract(third).nonEmpty)
    // past it: 5 of 12 drops
    val over = "<p>" + (1 to 7).map(i => s"w$i").mkString(" ") +
      " <a href='/x'>l1 l2 l3 l4 l5</a></p>"
    assert(extract(over) == "")
  }

  test("short blocks drop; inline markup does not split a block; " +
      "entity decode and whitespace collapse apply downstream") {
    assert(extract("<p>too few words here</p>") == "")
    val got = extract("<p>one <b>two</b> three four five six seven eight " +
      "nine &amp; ten &#8212; eleven</p>")
    assert(got == "one two three four five six seven eight nine & ten — eleven")
  }

  test("an UNCLOSED <a> (ubiquitous in crawl nav markup) cannot sink " +
      "later content blocks: anchor depth is block-scoped") {
    val got = extract("<div><a href=\"/\">menu</div>" +
      "<p>the real story follows with plenty of ordinary words to " +
      "clear the threshold easily today</p>")
    assert(got.startsWith("the real story"), got)
    assert(!got.contains("menu"), got)
  }

  test("<a> boundaries split words like any inline tag: no gluing") {
    val got = extract("<p>read more<a href='/x'>here</a>now plus other " +
      "padding words to pass the length gate</p>")
    assert(got.contains("more here now"), got)
  }

  test("gap fill: a short low-link block BETWEEN two content blocks is " +
      "promoted; edge/nav-flanked/link-dense shorts still drop") {
    val long1 = "<p>" + (1 to 12).map(i => s"a$i").mkString(" ") + "</p>"
    val long2 = "<p>" + (1 to 12).map(i => s"b$i").mkString(" ") + "</p>"
    // promoted: between two content paragraphs
    assert(extract(s"$long1<p>Short bridge</p>$long2") ==
      (1 to 12).map(i => s"a$i").mkString(" ") + " Short bridge " +
        (1 to 12).map(i => s"b$i").mkString(" "))
    // NOT promoted: leading/trailing shorts (one-sided neighbors)
    assert(!extract(s"<p>Lead in</p>$long1").contains("Lead in"))
    assert(!extract(s"$long1<p>read on</p>").contains("read on"))
    // NOT promoted: link-dense short between content (pagination)
    assert(!extract(s"$long1<p><a href='/2'>next page</a></p>$long2")
      .contains("next page"))
    // NOT promoted: neighbor is boilerplate, not content (no cascade)
    val nav = "<div><a href='/'>Home</a> <a href='/a'>About</a></div>"
    assert(!extract(s"$nav<p>stray note</p>$long2").contains("stray note"))
  }

  test("dirty input degrades to text, never throws: unclosed tags, quoted " +
      "'>', stray '<', truncation, markup-free input") {
    // attribute with a quoted '>' must not end the tag early
    val q = extract("<p title=\"a > b\">alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa</p>")
    assert(q.startsWith("alpha") && q.endsWith("kappa"), q)
    // stray '<' stays literal
    assert(extract("five < six and then seven eight nine ten eleven " +
      "twelve thirteen").contains("five < six"))
    // unterminated script drops to end, no throw
    assert(extract("<p>kept words one two three four five six seven " +
      "eight nine ten</p><script>var a=1;") ==
      "kept words one two three four five six seven eight nine ten")
    // markup-free input is one block under the same thresholds
    val plain = (1 to 11).map(i => s"t$i").mkString(" ")
    assert(extract(plain) == plain)
    assert(extract("short plain text") == "")
  }
}
