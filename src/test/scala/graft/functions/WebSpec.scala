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
}
