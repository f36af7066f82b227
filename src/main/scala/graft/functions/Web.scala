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

  /** Parse robots.txt bodies (RFC 9309) into RULE rows:
    * (domain, agent, rule ∈ allow|disallow, path). Consecutive
    * `User-agent` lines form one group's agent set; each Allow/Disallow
    * under the group emits one row per agent; a `User-agent` after rule
    * lines starts a NEW group. Comments strip at `#`, field names are
    * case-insensitive, unknown fields (Sitemap, Crawl-delay) skip per
    * the RFC, and an empty-valued Disallow means "allow all" and emits
    * nothing. Stateful line walk → `mapPartitions` (the [[Warc.records]]
    * precedent); everything downstream is relational. */
  def robotsRules(df: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("domain", StringType, nullable = false),
      StructField("agent", StringType, nullable = false),
      StructField("rule", StringType, nullable = false),
      StructField("path", StringType, nullable = false)))
    df.select(col(domainCol).cast("string"), col(txtCol).cast("string"))
      .as(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .mapPartitions { it =>
        it.flatMap { case (domain, txt0) =>
          // a fetch table naturally carries null bodies (404s,
          // timeouts): no robots means no rules — never an NPE
          val txt = if (domain == null || txt0 == null) "" else txt0
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          var agents = List.empty[String]
          var inRules = false
          txt.split("\n", -1).foreach { raw =>
            val noComment = raw.indexOf('#') match {
              case -1 => raw
              case h => raw.substring(0, h)
            }
            val line = noComment.trim
            val colon = line.indexOf(':')
            if (colon > 0) {
              val field = line.substring(0, colon).trim.toLowerCase
              val value = line.substring(colon + 1).trim
              field match {
                case "user-agent" =>
                  if (inRules) { agents = Nil; inRules = false }
                  agents ::= value.toLowerCase
                  // marker row: the GROUP exists even if it ends up
                  // with no rules (an empty specific group means
                  // "this agent may crawl everything" — it must still
                  // shadow the '*' group during selection)
                  out += Row(domain, value.toLowerCase, "agent", "")
                case "allow" | "disallow" =>
                  inRules = true
                  if (value.nonEmpty)
                    agents.foreach(a => out += Row(domain, a, field, value))
                case _ => () // Sitemap, Crawl-delay, unknown: skip
              }
            }
          }
          out
        }
      }(Encoders.row(schema))
  }

  /** Out-links of an HTML page, ABSOLUTIZED against the page URL — the
    * corpus-scale edge extractor that feeds the link-graph family
    * (PageRank/PPR/triangles) straight from a crawl scan, the WAT
    * shape. `<a href>` values come from one RE2-safe
    * `regexp_extract_all` capturing the full QUOTED value (each quote
    * style closes with its own delimiter, so apostrophes in
    * double-quoted paths survive; unquoted attribute values — legal
    * but rare in machine-written HTML — are documented out of scope).
    * Fragments TRIM (same page to a frontier); pure-fragment and empty
    * hrefs DROP (self-edges). Each href entity-decodes (query strings
    * escape `&` as `&amp;`). Resolution per RFC 3986's crawl-dominant
    * forms: http(s) absolute kept, OTHER schemes (mailto:, javascript:,
    * tel:, data: — any first-segment colon) dropped rather than
    * corrupted into fake relative edges, scheme-relative (`//host/…`),
    * root-relative (`/…`), query-only (`?…` onto the full base path),
    * path-relative (onto the base directory; dot-segment normalization
    * is documented out of scope — frontier dedup canonicalizes
    * downstream via [[canonicalizeUrl]]). Per-row codegen'd column
    * ops, no shuffle. */
  def extractLinks(html: Column, baseUrl: Column): Column = {
    val tokens = regexp_extract_all(html,
      lit("(?i)<a\\s[^>]*href=(\"[^\"]*\"|'[^']*')"), lit(1))
    val scheme = regexp_extract(baseUrl, "^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    val origin = regexp_extract(baseUrl,
      "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val afterOrigin = regexp_extract(baseUrl,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // base DIRECTORY: origin + path up to (and including) the last '/',
    // or origin + "/" when the path has none; base PATH keeps the file
    // (query-only hrefs replace the query, not the document)
    val dir = concat(origin,
      when(afterOrigin.contains("/"),
        regexp_extract(afterOrigin, "^(.*/)", 1)).otherwise(lit("/")))
    val basePath = concat(origin,
      when(afterOrigin === "", lit("/")).otherwise(afterOrigin))
    val resolved = transform(tokens, t => {
      val unq = t.substr(lit(2), length(t) - 2) // strip the quotes
      val noFrag = when(unq.contains("#"),
        substring_index(unq, "#", 1)).otherwise(unq)
      val h = org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.HtmlNumericEntityDecode(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(noFrag)))
      when(h === "", lit(null).cast("string"))
        .when(h.rlike("(?i)^https?://"), h)
        .when(h.startsWith("//"), concat(scheme, lit(":"), h))
        .when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), lit(null).cast("string"))
        .when(h.startsWith("/"), concat(origin, h))
        .when(h.startsWith("?"), concat(basePath, h))
        .otherwise(concat(dir, h))
    })
    filter(resolved, x => x.isNotNull)
  }

  /** Sitemap XML (sitemaps.org protocol) → one row per `<url>` entry:
    * (loc, lastmod, changefreq, priority — "" when absent) plus the
    * child sitemap locs of a `<sitemapindex>` (surfaced with
    * `is_index = true` so a frontier can recurse). URL discovery is
    * robots' companion crawl-side input. Pure codegen'd column ops —
    * `regexp_extract_all` over non-greedy `(?s)` patterns, RE2-safe so
    * an oracle replays them — because sitemap XML is machine-written
    * and flat; a full XML parser would buy nothing here (entities in
    * loc values decode with the same single-scan expression the HTML
    * path uses: sitemaps escape `&` as `&amp;`). */
  def sitemapUrls(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val blocks = regexp_extract_all(col(xmlCol),
      lit("(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"), lit(1))
    val isIndex = col(xmlCol).contains("<sitemapindex")
    def field(b: Column, name: String): Column = {
      val raw = regexp_extract(b, s"(?s)<$name>\\s*(.*?)\\s*</$name>", 1)
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        graft.expressions.HtmlNumericEntityDecode(
          org.apache.spark.sql.graftbridge.ColumnBridge.expression(raw)))
    }
    df.select(col(idCol), posexplode(blocks).as(Seq("entry_idx", "__b")),
        isIndex.as("is_index"))
      .select(col(idCol), col("entry_idx"), col("is_index"),
        field(col("__b"), "loc").as("loc"),
        field(col("__b"), "lastmod").as("lastmod"),
        field(col("__b"), "changefreq").as("changefreq"),
        field(col("__b"), "priority").as("priority"))
      .filter(col("loc") =!= "")
  }

  /** Per-URL robots decision for a crawler `agent` — the politeness
    * gate between a URL frontier and fetching (and the compliance
    * filter over an already-fetched corpus). RFC 9309 semantics:
    *
    *  - GROUP selection: if any group names this agent's product token
    *    (case-insensitive equality), ONLY that group applies; else the
    *    `*` group; no robots / no group → allowed;
    *  - RULE selection: among the group's rules whose pattern matches
    *    the URL path ([[graft.expressions.RobotsMatch]]: prefix match,
    *    `*` wildcard, `$` end anchor), the LONGEST pattern wins; an
    *    allow/disallow tie at equal length → allow; no match → allowed.
    *
    * Scale shape: rules join URLs keyed by domain (rules per domain are
    * tiny — effectively a broadcast side), decisions fold in ONE
    * aggregate (max over (length, is-allow) structs — the longest-match
    * + tie rule as plain struct ordering), and the verdict joins back
    * on a row id. Returns the input plus `robots_allowed`. */
  def robotsAllowed(urls: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, txtCol: String, agent: String): DataFrame = {
    val rules = robotsRules(robots, domainCol, txtCol)
      .select(col("domain").as("__rdom"), col("agent").as("__ragent"),
        (col("rule") === "allow").as("__rallow"),
        (col("rule") =!= "agent").as("__isrule"), col("path").as("__rpath"))
    val withId = urls.withColumn("__rid", monotonically_increasing_id())
    val host = lower(regexp_extract(col(urlCol), SchemeRe + "([^/?#]*)", 2))
    val rawPath = regexp_extract(col(urlCol), SchemeRe + "[^/?#]*([^#]*)", 2)
    val urlPath = when(rawPath === "", lit("/")).otherwise(rawPath)
    val matchExpr = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.expressions.RobotsMatch(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("__upath")),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("__rpath"))))
    val agentLc = agent.toLowerCase
    // the row id is evaluated ONCE (the original row rides the
    // aggregate as a struct — no join-back against a second evaluation
    // of a nondeterministic id, the reviewed cluster-correctness
    // hazard); within one evaluation the id only needs uniqueness
    val inCols = urls.columns.toSeq
    withId
      .select(col("__rid"), struct(inCols.map(col): _*).as("__row"),
        host.as("__udom"), urlPath.as("__upath"))
      .join(rules, col("__udom") === col("__rdom"), "left")
      .select(col("__rid"), col("__row"),
        (col("__ragent") === agentLc).as("__spec"),
        (col("__ragent") === "*").as("__star"),
        (col("__isrule") && matchExpr).as("__hit"),
        length(col("__rpath")).as("__plen"), col("__rallow"))
      .groupBy("__rid")
      .agg(
        first(col("__row")).as("__frow"),
        coalesce(max(col("__spec")), lit(false)).as("__hasSpec"),
        max(when(col("__spec") && col("__hit"),
          struct(col("__plen"), col("__rallow")))).as("__bestSpec"),
        max(when(col("__star") && col("__hit"),
          struct(col("__plen"), col("__rallow")))).as("__bestStar"))
      .select(col("__frow.*") +:
        when(col("__hasSpec"),
          coalesce(col("__bestSpec.__rallow"), lit(true)))
          .otherwise(coalesce(col("__bestStar.__rallow"), lit(true)))
          .as("robots_allowed") +: Nil: _*)
  }
}
