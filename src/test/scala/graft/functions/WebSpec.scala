package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WebSpec extends SparkSpec {
  private val sp = spark
  import sp.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Web.canonicalizeUrl(col("u"))).as[String].head()

  test("scheme and host lowercase; path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Some/Path") ==
      "https://www.example.com/Some/Path")
  }

  test("default ports stripped only for the matching scheme") {
    assert(canon("https://example.com:443/x") == "https://example.com/x")
    assert(canon("http://example.com:80/x") == "http://example.com/x")
    assert(canon("http://example.com:443/x") == "http://example.com:443/x")
    assert(canon("https://example.com:8443/x") == "https://example.com:8443/x")
  }

  test("empty path becomes /; trailing slash stripped but root kept") {
    assert(canon("https://example.com") == "https://example.com/")
    assert(canon("https://example.com/") == "https://example.com/")
    assert(canon("https://example.com/x/") == "https://example.com/x")
  }

  test("tracking params dropped, remainder sorted, fragment dropped") {
    assert(canon("https://example.com/p?b=2&utm_source=x&a=1&gclid=99#frag") ==
      "https://example.com/p?a=1&b=2")
    assert(canon("https://example.com/p?utm_campaign=only") == "https://example.com/p")
    assert(canon("https://example.com/p#frag") == "https://example.com/p")
    // a '?' INSIDE the fragment is fragment content, not a query
    assert(canon("https://example.com/p#sec?x=1") == "https://example.com/p")
  }

  test("empty trackingPrefixes disables stripping without crashing") {
    val out = Seq("https://example.com/p?utm_source=x&a=1").toDF("u")
      .select(Web.canonicalizeUrl(col("u"), trackingPrefixes = Seq.empty))
      .as[String].head()
    assert(out == "https://example.com/p?a=1&utm_source=x")
  }

  test("non-absolute strings pass through unchanged") {
    assert(canon("not a url") == "not a url")
    assert(canon("/relative/path?x=1") == "/relative/path?x=1")
  }

  test("canonicalization is idempotent over a generated messy corpus") {
    val schemes = Seq("http", "HTTPS", "https")
    val hosts = Seq("Example.com", "example.com:443", "sub.EXAMPLE.org:80", "example.net:8080")
    val paths = Seq("", "/", "/A/b/", "/x")
    val queries = Seq("", "?utm_source=1", "?b=2&a=1&gclid=9", "?z=3")
    val frags = Seq("", "#f", "#sec?x=1")
    val urls = for (s <- schemes; h <- hosts; p <- paths; q <- queries; f <- frags)
      yield s"$s://$h$p$q$f"
    val once = urls.toDF("u").select(Web.canonicalizeUrl(col("u")).as("c"))
    val twice = once.select(Web.canonicalizeUrl(col("c")))
      .as[String].collect()
    assert(twice.toSeq == once.as[String].collect().toSeq,
      "canon(canon(u)) must equal canon(u)")
  }

  test("urlDedup groups case/port/tracking variants and keeps min id") {
    val df = Seq(
      (1L, "https://Example.com/x?utm_source=a"),
      (2L, "HTTPS://example.COM:443/x"),
      (3L, "https://example.com/x/"),
      (4L, "https://example.org/y")).toDF("id", "url")
    val out = Web.urlDedup(df, "id", "url")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("https://example.com/x", 3L, 1L), ("https://example.org/y", 1L, 4L)))
  }

  test("robots.txt: RFC 9309 group selection, longest-match, allow tie, " +
      "wildcards, anchors, empty groups, missing robots") {
    val sp = spark
    import sp.implicits._
    val robots = Seq(
      ("a.test",
        """# politeness
          |User-agent: *
          |Disallow: /private
          |Allow: /private/ok
          |Disallow: /*.php$
          |Crawl-delay: 10
          |
          |User-agent: graftbot
          |Disallow: /tmp
          |
          |User-agent: emptybot
          |Disallow:
          |""".stripMargin),
      ("c.test",
        """User-agent: A
          |User-agent: B
          |Disallow: /both
          |""".stripMargin)).toDF("domain", "txt")
    val urls = Seq(
      "https://a.test/public/x", "https://a.test/private/x",
      "https://a.test/private/ok/x", "https://a.test/tmp/x",
      "https://a.test/y.php", "https://a.test/y.php?q=1",
      "https://b.test/anything", "https://c.test/both/x",
      "https://a.test").toDF("url")
    def allowed(agent: String): Map[String, Boolean] =
      Web.robotsAllowed(urls, "url", robots, "domain", "txt", agent)
        .select("url", "robots_allowed").as[(String, Boolean)]
        .collect().toMap
    val star = allowed("otherbot")
    assert(star("https://a.test/public/x"))
    assert(!star("https://a.test/private/x"))
    assert(star("https://a.test/private/ok/x")) // longest match: allow 11 > 8
    assert(star("https://a.test/tmp/x")) // graftbot group not selected
    assert(!star("https://a.test/y.php")) // $-anchored wildcard
    assert(star("https://a.test/y.php?q=1")) // query defeats the $ anchor
    assert(star("https://b.test/anything")) // no robots at all
    assert(star("https://a.test")) // bare root
    val bot = allowed("GraftBot") // case-insensitive product token
    assert(!bot("https://a.test/tmp/x"))
    assert(bot("https://a.test/private/x")) // ONLY the specific group applies
    assert(bot("https://a.test/y.php"))
    // an EMPTY specific group still shadows '*': everything allowed
    val empty = allowed("emptybot")
    assert(empty("https://a.test/private/x") && empty("https://a.test/y.php"))
    // multi-agent group: the rule binds to BOTH agents
    assert(!allowed("a")("https://c.test/both/x"))
    assert(!allowed("b")("https://c.test/both/x"))
    // tie at equal length: allow wins
    val tie = Seq(("t.test",
      "User-agent: *\nDisallow: /x/a\nAllow: /x/b\n")).toDF("domain", "txt")
    val tieUrls = Seq("https://t.test/x/a", "https://t.test/x/b").toDF("url")
    val td = Web.robotsAllowed(tieUrls, "url", tie, "domain", "txt", "any")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!td("https://t.test/x/a") && td("https://t.test/x/b"))
  }

  test("RobotsMatch glob walk: prefix, star, end anchor, literal mid-$") {
    import graft.expressions.RobotsMatch
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(RobotsMatch.matches(u("/a/b/c"), u("/a")))
    assert(!RobotsMatch.matches(u("/b"), u("/a")))
    assert(RobotsMatch.matches(u("/fish/salmon.html"), u("/fish*.html")))
    assert(RobotsMatch.matches(u("/x.php"), u("/*.php$")))
    assert(!RobotsMatch.matches(u("/x.phpy"), u("/*.php$")))
    assert(RobotsMatch.matches(u("/x.phpy"), u("/*.php")))
    assert(RobotsMatch.matches(u("/a$b"), u("/a$b"))) // mid-$ literal
    assert(RobotsMatch.matches(u("/anything"), u("")))
    assert(RobotsMatch.matches(u("/a"), u("/a$")))
    assert(!RobotsMatch.matches(u("/ab"), u("/a$")))
    assert(RobotsMatch.matches(u("/abc"), u("/*c$")))
    assert(RobotsMatch.matches(u("/abc"), u("/a*")))
  }

  test("robotsAllowed: null robots bodies (404/timeout fetches) are " +
      "rule-less, never an executor NPE") {
    val sp = spark
    import sp.implicits._
    val robots = Seq(("a.test", "User-agent: *\nDisallow: /x\n"),
      ("dead.test", null.asInstanceOf[String])).toDF("domain", "txt")
    val urls = Seq("https://a.test/x/1", "https://dead.test/x/1").toDF("url")
    val got = Web.robotsAllowed(urls, "url", robots, "domain", "txt", "b")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(!got("https://a.test/x/1") && got("https://dead.test/x/1"))
  }

  test("extractLinks: absolute, scheme-relative, root-relative, " +
      "path-relative resolution; entity decode; fragments drop") {
    val sp = spark
    import sp.implicits._
    val html = """<a href="https://x.test/abs">A</a>
      |<a href="//cdn.test/j.js">B</a>
      |<a href='/root'>C</a>
      |<a href="sib.html">D</a>
      |<a class="z" href="/q?a=1&amp;b=2">E</a>
      |<a href="/frag#sec">F</a>
      |<a name="anchor-only">no href</a>""".stripMargin
    val got = Seq(("https://e.test/dir/page.html", html)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got == Seq(
      "https://x.test/abs",
      "https://cdn.test/j.js",
      "https://e.test/root",
      "https://e.test/dir/sib.html",
      "https://e.test/q?a=1&b=2",
      "https://e.test/frag"), got)
    // non-http schemes DROP (never corrupt into fake relative edges);
    // apostrophes inside double-quoted paths survive; query-only hrefs
    // keep the base document; pure-fragment hrefs drop
    val html2 = """<a href="mailto:a@b.c">m</a>
      |<a href="javascript:void(0)">j</a>
      |<a href="/wiki/O'Brien">w</a>
      |<a href="?page=2">p</a>
      |<a href="#top">t</a>
      |<a href="">e</a>""".stripMargin
    val got3 = Seq(("https://e.test/dir/page.html", html2)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got3 == Seq(
      "https://e.test/wiki/O'Brien",
      "https://e.test/dir/page.html?page=2"), got3)
    // base with no path: directory defaults to origin + "/"
    val got2 = Seq(("https://e.test", "<a href=\"rel\">r</a>"))
      .toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got2 == Seq("https://e.test/rel"), got2)
  }

  test("canonicalizeUrl: dot segments fold (RFC 3986 §5.2.4)") {
    assert(canon("https://e.test/a/../b") == "https://e.test/b")
    assert(canon("https://e.test/a/./b/") == "https://e.test/a/b")
    assert(canon("https://e.test/../../x") == "https://e.test/x")
    assert(canon("https://e.test/a/b/../../") == "https://e.test/")
    assert(canon("https://e.test/a/..") == "https://e.test/")
    // a dotted FILENAME is not a dot segment
    assert(canon("https://e.test/a.b/..c/d.") == "https://e.test/a.b/..c/d.")
    // %2E decodes first (unreserved), THEN folds as a dot segment
    assert(canon("https://e.test/a/%2E%2E/b") == "https://e.test/b")
  }

  test("canonicalizeUrl: percent-encoding normalization (§6.2.2.2)") {
    // unreserved escapes decode
    assert(canon("https://e.test/%7Euser") == "https://e.test/~user")
    assert(canon("https://e.test/%7euser") == "https://e.test/~user")
    // reserved escapes stay encoded, hex uppercased
    assert(canon("https://e.test/a%2fb") == "https://e.test/a%2Fb")
    assert(canon("https://e.test/p?x=%3a1") == "https://e.test/p?x=%3A1")
    // dangling / non-hex '%' passes through literally (dirty crawl URLs)
    assert(canon("https://e.test/100%") == "https://e.test/100%")
    assert(canon("https://e.test/a%zz") == "https://e.test/a%zz")
  }

  test("extractLinks: dot segments in relative hrefs normalize to the " +
      "real URL; excess .. stop at the root") {
    val sp = spark
    import sp.implicits._
    val html = """<a href="../up.html">u</a>
      |<a href="x/../sib.html">s</a>
      |<a href="../../../far.html">f</a>
      |<a href="https://x.test/a/../keep/../b">abs</a>""".stripMargin
    val got = Seq(("https://e.test/d1/d2/page.html", html)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got == Seq(
      "https://e.test/d1/up.html",
      "https://e.test/d1/d2/sib.html",
      "https://e.test/far.html",
      "https://x.test/b"), got)
  }

  test("extractLinks: <base href> wins over the page URL; unquoted " +
      "href values extract") {
    val sp = spark
    import sp.implicits._
    val html = """<head><base href="https://cdn.test/b/"></head>
      |<a href="/root">r</a>
      |<a href="rel.html">p</a>
      |<a href=unquoted.html class=x>u</a>
      |<a href=/uq>q</a>""".stripMargin
    val got = Seq(("https://e.test/dir/page.html", html)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got == Seq(
      "https://cdn.test/root",
      "https://cdn.test/b/rel.html",
      "https://cdn.test/b/unquoted.html",
      "https://cdn.test/uq"), got)
    // a RELATIVE base href resolves against the page first; only the
    // FIRST base element counts
    val html2 = """<base href="sub/"><base href="https://other.test/">
      |<a href="x.html">x</a>""".stripMargin
    val got2 = Seq(("https://e.test/dir/page.html", html2)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got2 == Seq("https://e.test/dir/sub/x.html"), got2)
    // a non-resolvable base (javascript:) falls back to the page URL
    val html3 = """<base href="javascript:void(0)"><a href="y.html">y</a>"""
    val got3 = Seq(("https://e.test/dir/page.html", html3)).toDF("base", "h")
      .select(Web.extractLinks(col("h"), col("base"))).as[Seq[String]].head()
    assert(got3 == Seq("https://e.test/dir/y.html"), got3)
  }

  test("robotsRules: Sitemap lines surface as group-independent " +
      "discovery rows; robotsAllowed ignores them") {
    val sp = spark
    import sp.implicits._
    val robots = Seq(("a.test",
      """Sitemap: https://a.test/sm1.xml.gz
        |User-agent: *
        |Disallow: /x
        |Sitemap: https://a.test/sm2.xml
        |Allow: /x/ok
        |""".stripMargin)).toDF("domain", "txt")
    val rules = Web.robotsRules(robots, "domain", "txt")
      .as[(String, String, String, String)].collect().toSeq
    val sitemaps = rules.filter(_._3 == "sitemap")
    assert(sitemaps == Seq(
      ("a.test", "", "sitemap", "https://a.test/sm1.xml.gz"),
      ("a.test", "", "sitemap", "https://a.test/sm2.xml")))
    // the Sitemap line between Disallow and Allow does NOT split the
    // group: /x/ok still binds to '*'
    val urls = Seq("https://a.test/x/ok/1", "https://a.test/x/other").toDF("url")
    val got = Web.robotsAllowed(urls, "url", robots, "domain", "txt", "b")
      .select("url", "robots_allowed").as[(String, Boolean)].collect().toMap
    assert(got("https://a.test/x/ok/1") && !got("https://a.test/x/other"))
  }

  test("robotsAllowed: percent-normalized path matching; duplicate " +
      "frontier URLs keep their multiplicity") {
    val sp = spark
    import sp.implicits._
    val robots = Seq(("a.test", "User-agent: *\nDisallow: /%7Epriv\n"))
      .toDF("domain", "txt")
    val urls = Seq("https://a.test/~priv/x", "https://a.test/~priv/x",
      "https://a.test/%7epriv/y", "https://a.test/pub").toDF("url")
    val got = Web.robotsAllowed(urls, "url", robots, "domain", "txt", "b")
      .select("url", "robots_allowed").as[(String, Boolean)].collect()
    assert(got.length == 4) // dup row survives the distinct-verdict join
    val byUrl = got.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byUrl("https://a.test/~priv/x") == Seq(false, false))
    assert(byUrl("https://a.test/%7epriv/y") == Seq(false))
    assert(byUrl("https://a.test/pub") == Seq(true))
  }

  test("sitemapUrls: mismatched open/close tags segment nothing; " +
      "mixed documents index url entries before sitemap entries") {
    val sp = spark
    import sp.implicits._
    val bad = "<urlset><url><loc>https://e.test/a</loc></sitemap></urlset>"
    val mixed = "<sitemapindex><sitemap><loc>https://e.test/s.xml</loc>" +
      "</sitemap><url><loc>https://e.test/u</loc></url></sitemapindex>"
    val docs = Seq((1L, bad), (2L, mixed)).toDF("doc", "xml")
    val got = Web.sitemapUrls(docs, "doc", "xml")
      .select("doc", "entry_idx", "loc")
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(got == Seq((2L, 0, "https://e.test/u"),
      (2L, 1, "https://e.test/s.xml")), got)
  }

  test("registrableDomain: publicsuffix algorithm — plain, layered, " +
      "wildcard, exception, private registries, nulls") {
    def rd(h: String): Option[String] =
      Seq(h).toDF("h").select(Web.registrableDomain(col("h")))
        .as[Option[String]].head()
    assert(rd("example.com").contains("example.com"))
    assert(rd("A.B.Example.COM.").contains("example.com")) // case + root dot
    assert(rd("sub.example.co.uk").contains("example.co.uk"))
    assert(rd("x.co.uk").contains("x.co.uk")) // distinct registrant kept
    assert(rd("user.github.io").contains("user.github.io")) // private registry
    assert(rd("deep.user.github.io").contains("user.github.io"))
    // wildcard *.ck: one extra label is public; exception !www.ck
    assert(rd("a.x.ck").contains("a.x.ck"))
    assert(rd("www.ck").contains("www.ck"))
    assert(rd("sub.www.ck").contains("www.ck"))
    assert(rd("x.ck").isEmpty) // itself a public suffix under *.ck
    // bare suffixes, IPs, junk → null
    assert(rd("com").isEmpty && rd("co.uk").isEmpty)
    assert(rd("192.168.0.1").isEmpty && rd("::1").isEmpty)
    assert(rd("a..b").isEmpty && rd("").isEmpty)
    // unknown TLD falls to the default '*' rule: TLD is public
    assert(rd("foo.unknowntld").contains("foo.unknowntld"))
    assert(rd("a.b.foo.unknowntld").contains("foo.unknowntld"))
    // caller-supplied rules override the embedded subset
    val custom = Seq("h").toDF("h")
      .select(Web.registrableDomain(lit("a.b.internal"),
        rules = Some(Seq("internal", "*.corp.internal"))))
      .as[Option[String]].head()
    assert(custom.contains("b.internal"))
    // wildcard beats a same-position plain rule (one label longer)
    val wc = Seq("h").toDF("h")
      .select(Web.registrableDomain(lit("a.x.ck"),
        rules = Some(Seq("ck", "*.ck")))).as[Option[String]].head()
    assert(wc.contains("a.x.ck"))
  }

  test("surtKey: canonicalize + www strip + label reversal; " +
      "non-absolute passthrough; domain pages sort contiguously") {
    def surt(u: String): String =
      Seq(u).toDF("u").select(Web.surtKey(col("u"))).as[String].head()
    assert(surt("HTTPS://WWW.Example.COM:443/A/b/?b=2&a=1#f") ==
      "com,example)/A/b?a=1&b=2")
    assert(surt("http://sub.example.co.uk/x/../y") == "uk,co,example,sub)/y")
    assert(surt("https://example.com") == "com,example)/")
    assert(surt("not a url") == "not a url")
    // sort contiguity: every example.com page precedes example.net
    val keys = Seq("https://a.example.net/z", "https://www.example.com/b",
      "https://sub.example.com/a").map(surt).sorted
    assert(keys == Seq("com,example)/b", "com,example,sub)/a",
      "net,example,a)/z"))
  }

  test("cdxjLines: member geometry from the scan (length = next offset " +
      "minus offset, null for the last member); JSON fields present") {
    val sp = spark
    import sp.implicits._
    val scan = Seq(
      ("f/1.warc.gz", 0L, 0, "warcinfo", "", "2024-01-01T00:00:00Z",
        "", 10L, 0, "", "", "", ""),
      ("f/1.warc.gz", 100L, 0, "response", "https://e.test/a",
        "2024-01-02T03:04:05Z", "text/html", 50L, 200, "", "", "sha1:X", ""),
      ("f/1.warc.gz", 300L, 0, "response", "https://e.test/b",
        "2024-01-02T03:04:06Z", "text/html", 60L, 404, "", "", "sha1:Y", ""))
      .toDF("path", "rec_offset", "rec_seq", "warc_type", "target_uri",
        "warc_date", "content_type", "content_length", "http_status",
        "warc_record_id", "warc_refers_to", "payload_digest", "payload_text")
    val got = Web.cdxjLines(scan)
      .select("surt", "ts14", "offset", "length", "status", "cdxj")
      .as[(String, String, Long, Option[Long], Int, String)]
      .collect().sortBy(_._3)
    assert(got.length == 2)
    assert(got(0)._1 == "test,e)/a" && got(0)._2 == "20240102030405")
    assert(got(0)._3 == 100L && got(0)._4.contains(200L)) // 300 - 100
    assert(got(1)._4.isEmpty) // last member: end unknown to the scan
    assert(got(0)._6.contains("\"digest\":\"sha1:X\"") &&
      got(0)._6.contains("\"length\":200") &&
      got(0)._6.contains("\"filename\":\"1.warc.gz\""))
    assert(got(1)._6.contains("\"status\":404") &&
      !got(1)._6.contains("\"length\""))
    // a URI with a quote must not break the JSON line
    val evil = scan.withColumn("target_uri",
      concat(col("target_uri"), lit("?q=\"x\"")))
    val line = Web.cdxjLines(evil).select("cdxj").as[String].head()
    assert(line.contains("?q=\\\"x\\\""), line)
  }

  test("inflate: gzip bodies inflate, plain bytes pass through") {
    val sp = spark
    import sp.implicits._
    val xml = "<urlset><url><loc>https://e.test/z</loc></url></urlset>"
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(xml.getBytes("UTF-8")); gz.close()
    val df = Seq((1L, bos.toByteArray), (2L, "plain".getBytes("UTF-8")))
      .toDF("id", "body")
    val got = df.select(col("id"), decode(Web.inflate(col("body")), "UTF-8"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == xml && got(2L) == "plain")
  }
}
