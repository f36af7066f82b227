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
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x")
    assert(canon("https://a.com:8443/x") == "https://a.com:8443/x")
  }

  test("empty path becomes /; trailing slash stripped but root kept") {
    assert(canon("https://a.com") == "https://a.com/")
    assert(canon("https://a.com/") == "https://a.com/")
    assert(canon("https://a.com/x/") == "https://a.com/x")
  }

  test("tracking params dropped, remainder sorted, fragment dropped") {
    assert(canon("https://a.com/p?b=2&utm_source=x&a=1&gclid=99#frag") ==
      "https://a.com/p?a=1&b=2")
    assert(canon("https://a.com/p?utm_campaign=only") == "https://a.com/p")
    assert(canon("https://a.com/p#frag") == "https://a.com/p")
    // a '?' INSIDE the fragment is fragment content, not a query
    assert(canon("https://a.com/p#sec?x=1") == "https://a.com/p")
  }

  test("empty trackingPrefixes disables stripping without crashing") {
    val out = Seq("https://a.com/p?utm_source=x&a=1").toDF("u")
      .select(Web.canonicalizeUrl(col("u"), trackingPrefixes = Seq.empty))
      .as[String].head()
    assert(out == "https://a.com/p?a=1&utm_source=x")
  }

  test("non-absolute strings pass through unchanged") {
    assert(canon("not a url") == "not a url")
    assert(canon("/relative/path?x=1") == "/relative/path?x=1")
  }

  test("urlDedup groups case/port/tracking variants and keeps min id") {
    val df = Seq(
      (1L, "https://A.com/x?utm_source=a"),
      (2L, "HTTPS://a.COM:443/x"),
      (3L, "https://a.com/x/"),
      (4L, "https://b.com/y")).toDF("id", "url")
    val out = Web.urlDedup(df, "id", "url")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("https://a.com/x", 3L, 1L), ("https://b.com/y", 1L, 4L)))
  }
}
