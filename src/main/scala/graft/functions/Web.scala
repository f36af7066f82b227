package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** URL canonicalization + dedup — the first dedup pass of every web-scale
  * corpus pipeline (crawl frontiers emit the same page under scheme/host
  * case variants, default ports, tracking params, fragments, trailing
  * slashes, dot segments, and percent-encoding variants).
  *
  * Built from `regexp_extract` + array functions plus three tiny native
  * scalar expressions ([[graft.expressions.RemoveDotSegments]],
  * [[graft.expressions.PercentNormalize]],
  * [[graft.expressions.RobotsMatch]]) — no regex REPLACEMENT with
  * backreferences (whose `$1` vs `\1` syntax differs across engines), so
  * the DuckDB oracle replays or restates every transformation
  * byte-for-byte. All patterns are RE2-compatible. Per-row, shuffle-free
  * except where documented.
  */
object Web {

  /** Query parameters dropped during canonicalization (matched by prefix,
    * so `utm_source=…`, `fbclid=…`, `gclid=…` all go). */
  val TrackingParamPrefixes: Seq[String] = Seq("utm_", "fbclid", "gclid")

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"

  private def pctNorm(c: Column): Column =
    ColumnBridge.column(graft.expressions.PercentNormalize(
      ColumnBridge.expression(c)))

  private def dotSegments(c: Column): Column =
    ColumnBridge.column(graft.expressions.RemoveDotSegments(
      ColumnBridge.expression(c)))

  private def entityDecode(c: Column): Column =
    ColumnBridge.column(graft.expressions.HtmlNumericEntityDecode(
      ColumnBridge.expression(c)))

  private def stripQuotes(t: Column): Column =
    when(t.startsWith("\"") || t.startsWith("'"),
      t.substr(lit(2), length(t) - 2)).otherwise(t)

  /** RFC 3986 §5.2.4 dot-segment removal applied to the PATH portion of
    * an absolute URL (scheme://authority and ?query/#fragment tails ride
    * through untouched); non-absolute strings pass unchanged. */
  private def normalizeUrlPath(u: Column): Column = {
    val pre = regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val p = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val tail = regexp_extract(u, "^[^?#]*([?#].*)?$", 1)
    when(pre === "", u).otherwise(concat(pre, dotSegments(p), tail))
  }

  /** Canonical form of an absolute URL: lowercase scheme and host, default
    * ports (`:80` http, `:443` https) stripped, path percent-normalized
    * (RFC 3986 §6.2.2.2: unreserved escapes decode, other escapes
    * uppercase — `%7Euser` and `~user` dedup together) then dot-segment
    * normalized (§5.2.4: `/a/../b` and `/b` dedup together) then
    * defaulted to `/` with the trailing slash removed, query
    * percent-normalized and params sorted with tracking params dropped,
    * fragment dropped. Non-absolute strings (no `scheme://`) pass
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
    // percent-normalize FIRST (a %2E becomes a real dot), then fold dot
    // segments — RFC 3986 §6.2.2's prescribed order
    val pathN = dotSegments(pctNorm(path0))
    val path = when(length(pathN) > 1 && pathN.endsWith("/"),
      pathN.substr(lit(1), length(pathN) - 1)).otherwise(pathN)
    // the query starts at the FIRST '?' only if it precedes any '#' — a '?'
    // inside the fragment is fragment content and must vanish with it
    val query = pctNorm(regexp_extract(url, "^[^#?]*\\?([^#]*)", 1))
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
    * (domain, agent, rule ∈ allow|disallow|agent|sitemap, path).
    * Consecutive `User-agent` lines form one group's agent set; each
    * Allow/Disallow under the group emits one row per agent; a
    * `User-agent` after rule lines starts a NEW group. `Sitemap:` lines
    * are GROUP-INDEPENDENT per the RFC and surface as
    * `(domain, "", "sitemap", url)` rows — they are how real frontiers
    * FIND the sitemaps [[sitemapUrls]] parses. Comments strip at `#`,
    * field names are case-insensitive, other non-rule fields
    * (Crawl-delay, unknown) skip per the RFC, and an empty-valued
    * Disallow means "allow all" and emits nothing. Stateful line walk →
    * `mapPartitions` (the [[Warc.records]] precedent); everything
    * downstream is relational. */
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
                case "sitemap" =>
                  // group-independent (RFC 9309 §2.3-adjacent, per
                  // sitemaps.org): no agent scope, does NOT open or
                  // close a rule group
                  if (value.nonEmpty) out += Row(domain, "", "sitemap", value)
                case _ => () // Crawl-delay, unknown fields: skip
              }
            }
          }
          out
        }
      }(Encoders.row(schema))
  }

  /** Out-links of an HTML page, RESOLVED per RFC 3986 §5 — the
    * corpus-scale edge extractor that feeds the link-graph family
    * (PageRank/PPR/triangles) straight from a crawl scan, the WAT
    * shape. `<a href>` values extract double-quoted, single-quoted,
    * and unquoted attribute forms. When the page
    * carries a `<base href>` element (templated/CDN-hosted sites), the
    * FIRST one is itself resolved against the page URL and becomes the
    * base every link resolves against (HTML spec; WAT extractors honor
    * it). Fragments TRIM (same page to a frontier); pure-fragment and
    * empty hrefs DROP (self-edges). Each href entity-decodes (query
    * strings escape `&` as `&amp;`). Resolution per the RFC's
    * crawl-dominant forms: http(s) absolute kept, OTHER schemes
    * (mailto:, javascript:, tel:, data: — any first-segment colon)
    * dropped rather than corrupted into fake relative edges,
    * scheme-relative (`//host/…`), root-relative (`/…`), query-only
    * (`?…` onto the full base path), path-relative (onto the base
    * directory). Every resolved URL's path is dot-segment normalized
    * (§5.2.4) — `../a.html` yields the one real URL, not a
    * `/dir/../a.html` ghost node. ONE native per-row pass
    * ([[graft.expressions.ExtractLinks]] — the column-level
    * composition re-ran its regexes per link inside an interpreted
    * lambda, a measured 26× slowdown on the link-graph board), no
    * shuffle. */
  def extractLinks(html: Column, baseUrl: Column): Column =
    ColumnBridge.column(graft.expressions.ExtractLinks(
      ColumnBridge.expression(html), ColumnBridge.expression(baseUrl)))

  /** SURT key (Sort-friendly URI Reordering Transform — the Common
    * Crawl / OpenWayback index key): the CANONICAL URL
    * ([[canonicalizeUrl]]: case, ports, dot segments, percent
    * encoding, tracking params, fragment) with the scheme dropped, a
    * leading `www.` stripped, host labels REVERSED and comma-joined,
    * then `)` + path + query — so one registrable domain's pages sort
    * contiguously (`com,example)/a`, `com,example,sub)/b`), which is
    * what makes a petabyte CDX index range-scannable by domain.
    * Non-absolute input passes through unchanged. */
  def surtKey(url: Column): Column = {
    val canon = canonicalizeUrl(url)
    val scheme = regexp_extract(canon, SchemeRe, 1)
    val host0 = regexp_extract(canon, SchemeRe + "([^/?#]*)", 2)
    val host = when(host0.startsWith("www."),
      host0.substr(lit(5), length(host0) - 4)).otherwise(host0)
    val rest = regexp_extract(canon, SchemeRe + "[^/?#]*(.*)$", 2)
    when(scheme === "", url).otherwise(
      concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), rest))
  }

  /** CDXJ index rows for a WARC scan (the Common Crawl `cdx-*.gz`
    * shape, one line per response): `surt`, `ts14` (the WARC-Date
    * digits), and the JSON fields an index serves — original url,
    * mime, status, payload digest, member `offset` within the file,
    * member `length` (next member's offset minus this one's — null
    * for a file's LAST record, whose end only the file length knows),
    * and `filename`. One window per file path orders members; index
    * generation is a per-file pass, so the shuffle is by path —
    * bounded by file count, not records. Input columns are the
    * `format("warc")` scan's. */
  def cdxjLines(scan: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("path"))
      .orderBy(col("rec_offset"), col("rec_seq"))
    val withLen = scan
      .select(col("path"), col("rec_offset"), col("rec_seq"),
        col("warc_type"), col("target_uri"), col("warc_date"),
        col("content_type"), col("http_status"), col("payload_digest"))
      .withColumn("__next", lead(col("rec_offset"), 1).over(w))
      .withColumn("length", col("__next") - col("rec_offset"))
      .drop("__next")
      .filter(col("warc_type") === "response")
    val filename = element_at(split(col("path"), "/"), -1)
    // JSON string safety for the one crawl-controlled field: a URI
    // carrying '"' or '\' must not break the line
    val jsonUri = regexp_replace(
      regexp_replace(col("target_uri"), "\\\\", "\\\\\\\\"),
      "\"", "\\\\\"")
    withLen.select(
      surtKey(col("target_uri")).as("surt"),
      regexp_replace(col("warc_date"), "[^0-9]", "").as("ts14"),
      concat(lit("{\"url\":\""), jsonUri,
        lit("\",\"mime\":\""), col("content_type"),
        lit("\",\"status\":"), col("http_status"),
        lit(",\"digest\":\""), col("payload_digest"),
        lit("\",\"offset\":"), col("rec_offset"),
        when(col("length").isNotNull,
          concat(lit(",\"length\":"), col("length"))).otherwise(lit("")),
        lit(",\"filename\":\""), filename, lit("\"}")).as("cdxj"),
      col("rec_offset").as("offset"), col("length"),
      col("http_status").as("status"))
  }

  /** Lowercased host of an absolute URL ("" for non-absolute input) —
    * the join/grouping key for robots, domain caps, and
    * [[registrableDomain]]. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, SchemeRe + "([^/?#:]*)", 2))

  /** REGISTRABLE DOMAIN (eTLD+1) of a host per the publicsuffix.org
    * algorithm ([[graft.expressions.RegistrableDomain]]) — the key
    * crawl policies actually group by: per-HOST caps let one site
    * dodge across subdomains and punish distinct registrants under
    * multi-label registries (`x.co.uk` vs `y.co.uk`); private
    * registries (`github.io`) correctly make each user site its own
    * domain. `rules` defaults to the curated embedded subset
    * ([[graft.expressions.PslTable.Default]]); production feeds the
    * full downloaded list's lines. NULL for bare public suffixes, IP
    * literals, and empty hosts. Table plan-ships once per task. */
  def registrableDomain(host: Column,
      rules: Option[Seq[String]] = None): Column =
    ColumnBridge.column(graft.expressions.RegistrableDomain(
      ColumnBridge.expression(host),
      rules.map(new graft.expressions.PslTable(_))
        .getOrElse(graft.expressions.PslTable.Default)))

  /** Transparent gzip inflate of a binary column
    * ([[graft.expressions.InflateBytes]]) — for SMALL compressed
    * payloads riding columns (the wild's dominant `sitemap.xml.gz`
    * bodies out of a fetch table); non-gzip bytes pass through, so
    * mixed columns are safe. Whole compressed FILES belong to the
    * splittable archive readers, not this. */
  def inflate(bytes: Column): Column =
    ColumnBridge.column(graft.expressions.InflateBytes(
      ColumnBridge.expression(bytes)))

  /** Sitemap XML (sitemaps.org protocol) → one row per `<url>` entry:
    * (loc, lastmod, changefreq, priority — "" when absent) plus the
    * child sitemap locs of a `<sitemapindex>` (surfaced with
    * `is_index = true` so a frontier can recurse). URL discovery is
    * robots' companion crawl-side input. Pure codegen'd column ops —
    * `regexp_extract_all` over non-greedy `(?s)` patterns, RE2-safe so
    * an oracle replays them — because sitemap XML is machine-written
    * and flat; a full XML parser would buy nothing here (entities in
    * loc values decode with the same single-scan expression the HTML
    * path uses: sitemaps escape `&` as `&amp;`). `<url>` and
    * `<sitemap>` blocks extract in SEPARATE tag-matched passes (open
    * and close tags must agree — a mismatched `<url>…</sitemap>` pair
    * in a malformed document segments nothing instead of something
    * wrong); in a pathological mixed document url entries index before
    * sitemap entries. */
  def sitemapUrls(df: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    val blocks = concat(
      regexp_extract_all(col(xmlCol), lit("(?s)<url>(.*?)</url>"), lit(1)),
      regexp_extract_all(col(xmlCol),
        lit("(?s)<sitemap>(.*?)</sitemap>"), lit(1)))
    val isIndex = col(xmlCol).contains("<sitemapindex")
    def field(b: Column, name: String): Column =
      entityDecode(regexp_extract(b, s"(?s)<$name>\\s*(.*?)\\s*</$name>", 1))
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
    *    allow/disallow tie at equal length → allow; no match → allowed;
    *  - both the URL path and rule paths percent-normalize first
    *    (§2.2.2 of the RFC defers to RFC 3986 octet equivalence), so
    *    `/%7Euser` rules match `/~user` fetches.
    *
    * Scale + determinism shape: decisions compute per DISTINCT url —
    * repeated frontier URLs evaluate once — keyed by the URL VALUE
    * itself (deterministic under partial stage recompute, unlike a
    * generated row id), then join back to the input rows by that
    * value (null-safe). Rules join URLs keyed by domain (rules per
    * domain are tiny — effectively a broadcast side) and the verdict
    * folds in ONE aggregate (max over (length, is-allow) structs — the
    * longest-match + tie rule as plain struct ordering). Returns the
    * input plus `robots_allowed`. */
  def robotsAllowed(urls: DataFrame, urlCol: String, robots: DataFrame,
      domainCol: String, txtCol: String, agent: String): DataFrame = {
    val rules = robotsRules(robots, domainCol, txtCol)
      .filter(col("rule") =!= "sitemap") // discovery rows, not rules
      .select(col("domain").as("__rdom"), col("agent").as("__ragent"),
        (col("rule") === "allow").as("__rallow"),
        (col("rule") =!= "agent").as("__isrule"),
        pctNorm(col("path")).as("__rpath"))
    val host = lower(regexp_extract(col("__uurl"), SchemeRe + "([^/?#]*)", 2))
    val rawPath = regexp_extract(col("__uurl"), SchemeRe + "[^/?#]*([^#]*)", 2)
    val urlPath = pctNorm(when(rawPath === "", lit("/")).otherwise(rawPath))
    val matchExpr = ColumnBridge.column(
      graft.expressions.RobotsMatch(
        ColumnBridge.expression(col("__upath")),
        ColumnBridge.expression(col("__rpath"))))
    val agentLc = agent.toLowerCase
    val verdicts = urls.select(col(urlCol).as("__uurl")).distinct()
      .select(col("__uurl"), host.as("__udom"), urlPath.as("__upath"))
      .join(rules, col("__udom") === col("__rdom"), "left")
      .select(col("__uurl"),
        (col("__ragent") === agentLc).as("__spec"),
        (col("__ragent") === "*").as("__star"),
        (col("__isrule") && matchExpr).as("__hit"),
        length(col("__rpath")).as("__plen"), col("__rallow"))
      .groupBy("__uurl")
      .agg(
        coalesce(max(col("__spec")), lit(false)).as("__hasSpec"),
        max(when(col("__spec") && col("__hit"),
          struct(col("__plen"), col("__rallow")))).as("__bestSpec"),
        max(when(col("__star") && col("__hit"),
          struct(col("__plen"), col("__rallow")))).as("__bestStar"))
      .select(col("__uurl"),
        when(col("__hasSpec"),
          coalesce(col("__bestSpec.__rallow"), lit(true)))
          .otherwise(coalesce(col("__bestStar.__rallow"), lit(true)))
          .as("robots_allowed"))
    urls.join(verdicts, urls(urlCol) <=> verdicts("__uurl"), "left")
      .drop("__uurl")
  }
}
