package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Immutable public-suffix rule table (publicsuffix.org list format):
  * plain rules, `*.` wildcard rules, and `!` exception rules, matched
  * per the published algorithm. Plan-shipped ONCE per task as a
  * reference object (the [[BpeTable]] / HashedBagScore.Model pattern)
  * — never per row. Construction normalizes to lowercase and drops
  * comments/blank lines, so a raw PSL file's lines feed in directly. */
final class PslTable(ruleLines: Seq[String]) extends Serializable {
  val plain = new java.util.HashSet[String]()
  val wildcard = new java.util.HashSet[String]() // stored WITHOUT the '*.'
  val exception = new java.util.HashSet[String]() // stored WITHOUT the '!'
  ruleLines.foreach { raw =>
    val line = raw.trim.toLowerCase
    if (line.nonEmpty && !line.startsWith("//")) {
      if (line.startsWith("!")) exception.add(line.substring(1))
      else if (line.startsWith("*.")) wildcard.add(line.substring(2))
      else plain.add(line)
    }
  }
}

object PslTable {
  /** A curated SUBSET of the public suffix list (publicsuffix.org —
    * public data): the high-traffic ICANN suffixes plus the
    * highest-volume private registries, and the `*.ck`/`!www.ck`
    * pair so wildcard + exception handling stays exercised. A
    * production deployment feeds the FULL downloaded list into
    * [[PslTable]]; the algorithm is complete, only this default
    * table is partial. */
  val Default: PslTable = new PslTable(Seq(
    // generic TLDs
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "io", "ai", "co", "dev", "app", "xyz", "online", "site",
    "top", "shop", "blog", "cloud", "tech", "store", "news", "me",
    "tv", "cc", "ws", "mobi", "pro",
    // ccTLDs with flat registration
    "de", "fr", "it", "nl", "es", "pl", "ru", "ch", "at", "be", "cz",
    "gr", "pt", "ro", "hu", "se", "no", "fi", "dk", "ie", "us", "ca",
    "mx", "cl", "eu", "jp", "cn", "in", "kr", "tw", "hk", "sg", "my",
    "id", "th", "vn", "ph", "ar", "pe", "ve", "ec", "is", "li", "lu",
    "sk", "si", "hr", "bg", "lt", "lv", "ee", "ua", "by", "kz", "il",
    "sa", "ae", "eg", "ma", "ng", "ke", "za", "br", "au", "nz", "uk",
    "tr", "ir", "pk", "bd",
    // layered ccTLD registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "com.cn", "net.cn", "org.cn", "edu.cn", "gov.cn", "ac.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "gov.in", "res.in", "nic.in",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd", "ac.bd",
    // the classic wildcard + exception pair (real PSL entries)
    "*.ck", "!www.ck",
    // high-volume private registries
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "netlify.app", "vercel.app", "pages.dev", "web.app",
    "herokuapp.com", "azurewebsites.net", "cloudfront.net",
    "amazonaws.com", "s3.amazonaws.com", "firebaseapp.com",
    "appspot.com", "fastly.net", "windows.net", "readthedocs.io",
    "neocities.org", "tumblr.com", "medium.com", "substack.com"))
}

/** Native Catalyst expression: REGISTRABLE DOMAIN (eTLD+1) of a host
  * name per the publicsuffix.org algorithm — the key corpus-scale
  * crawl policies actually group by. A per-HOST domain cap lets one
  * site dodge the cap across subdomains (`a.blog.example.com`,
  * `b.blog.example.com`), and punishes distinct registrants sharing
  * a multi-label registry (`x.co.uk` vs `y.co.uk` are DIFFERENT
  * sites); eTLD+1 fixes both, and for private registries like
  * `github.io` correctly treats each user site as its own domain.
  *
  * Matching per the published rules: among matching suffixes an
  * exception rule prevails (its public suffix is the rule minus its
  * first label), else the LONGEST match (wildcard `*.x` matches one
  * extra label), else the default `*` rule (the bare TLD). Returns
  * the public suffix plus one label; NULL when the host IS a public
  * suffix, is empty, or is an IP literal (IPs are not domains — PSL
  * FAQ). Hosts lowercase and a trailing dot strips first. Per-row,
  * table plan-shipped once, whole-stage codegen via
  * [[RegistrableDomain.compute]]. */
case class RegistrableDomain(child: Expression, table: PslTable)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string host, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def prettyName: String = "registrable_domain"

  override protected def nullSafeEval(input: Any): Any =
    RegistrableDomain.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pslTable", table, classOf[PslTable].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.expressions.RegistrableDomain.compute($v, $ref);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): RegistrableDomain =
    copy(child = newChild)
}

object RegistrableDomain {

  private def isIpLiteral(h: String): Boolean = {
    if (h.indexOf(':') >= 0) return true // IPv6 (or a port leak — not a domain)
    var digitsAndDots = h.nonEmpty
    var i = 0
    while (digitsAndDots && i < h.length) {
      val c = h.charAt(i)
      if (!(c == '.' || (c >= '0' && c <= '9'))) digitsAndDots = false
      i += 1
    }
    digitsAndDots
  }

  /** Null result maps to Java null (the expression wraps it). */
  def compute(input: UTF8String, table: PslTable): UTF8String = {
    var h = input.toString.toLowerCase
    if (h.endsWith(".")) h = h.substring(0, h.length - 1)
    if (h.isEmpty || isIpLiteral(h)) return null
    val labels = h.split("\\.", -1)
    if (labels.exists(_.isEmpty)) return null // "a..b" is not a hostname
    val n = labels.length
    // suffix starting at i: labels[i..n)
    def suffix(i: Int): String = {
      val sb = new java.lang.StringBuilder
      var k = i
      while (k < n) {
        if (k > i) sb.append('.')
        sb.append(labels(k)); k += 1
      }
      sb.toString
    }
    // exception rules prevail: public suffix = rule minus first label
    var i = 0
    while (i < n) {
      if (table.exception.contains(suffix(i)))
        return UTF8String.fromString(suffix(i)) // reg. domain = the rule itself
      i += 1
    }
    // longest match wins: scan from the LONGEST suffix (i = 0) down.
    // Within one position the WILDCARD check goes first — a '*.x'
    // match is one label longer than a plain 'x' match at the same i
    // (rules 'ck' + '*.ck' on host a.x.ck must pick x.ck, not ck)
    var psStart = n - 1 // default '*' rule: the bare TLD is public
    i = 0
    var found = false
    while (!found && i < n) {
      if (i > 0 && table.wildcard.contains(suffix(i))) {
        psStart = i - 1; found = true
      } else if (table.plain.contains(suffix(i))) { psStart = i; found = true }
      i += 1
    }
    if (psStart == 0) null // the host IS a public suffix
    else UTF8String.fromString(suffix(psStart - 1))
  }
}
