package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + dedup — the first dedup pass of every web-scale
  * corpus pipeline (crawl frontiers emit the same page under scheme/host
  * case variants, default ports, tracking params, fragments, and trailing
  * slashes).
  *
  * Built from `regexp_extract` + array functions only — no regex
  * REPLACEMENT with backreferences (whose `$1` vs `\1` syntax differs
  * across engines), so the DuckDB oracle replays the transformation
  * byte-for-byte. All patterns are RE2-compatible. Per-row, shuffle-free.
  */
object Web {

  /** Query parameters dropped during canonicalization (matched by prefix,
    * so `utm_source=…`, `fbclid=…`, `gclid=…` all go). */
  val TrackingParamPrefixes: Seq[String] = Seq("utm_", "fbclid", "gclid")

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  /** Canonical form of an absolute URL: lowercase scheme and host, default
    * ports (`:80` http, `:443` https) stripped, path defaulted to `/` and
    * trailing slash removed, query params sorted with tracking params
    * dropped, fragment dropped. Non-absolute strings (no `scheme://`) pass
    * through unchanged. */
  def canonicalizeUrl(url: Column,
      trackingPrefixes: Seq[String] = TrackingParamPrefixes): Column = {
    val scheme = lower(regexp_extract(url, SchemeRe, 1))
    val hostport = lower(regexp_extract(url, SchemeRe + "([^/?#]*)", 2))
    val host =
      when(scheme === "http" && hostport.endsWith(":80"),
        hostport.substr(lit(1), length(hostport) - 3))
        .when(scheme === "https" && hostport.endsWith(":443"),
          hostport.substr(lit(1), length(hostport) - 4))
        .otherwise(hostport)
    val rawPath = regexp_extract(url, SchemeRe + "[^/?#]*([^?#]*)", 2)
    val path0 = when(rawPath === "", lit("/")).otherwise(rawPath)
    val path = when(length(path0) > 1 && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    // the query starts at the FIRST '?' only if it precedes any '#' — a '?'
    // inside the fragment is fragment content and must vanish with it
    val query = regexp_extract(url, "^[^#?]*\\?([^#]*)", 1)
    val kept = array_join(array_sort(filter(split(query, "&"),
      p => p =!= lit("") &&
        !trackingPrefixes.map(t => p.startsWith(t))
          .foldLeft(lit(false))(_ || _))), "&")
    val canon = concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
    when(scheme === "", url).otherwise(canon)
  }

  /** Canonical-URL dedup groups: one row per canonical URL with the
    * duplicate count and the minimum id as the canonical survivor. One
    * shuffle on the canonical string. */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))
}
