package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UnaryKernelCodegen

/** Registrable-domain extraction backed by a bundled snapshot of the
  * public suffix list (publicsuffix.org — public knowledge; Mozilla
  * maintains the canonical file under MPL 2.0). The crawl pipeline's
  * per-domain key MUST group `news.bbc.co.uk` with `www.bbc.co.uk`
  * under `bbc.co.uk`, not `co.uk` — a naive last-two-labels key (the
  * old TextOps.urlDomain) collapses every .co.uk site into one domain
  * and destroys per-domain rate limits / dedup stats.
  *
  * The snapshot is a curated subset: the high-traffic ICANN
  * second-level country suffixes plus the user-content private
  * suffixes a web crawl actually hits (github.io, blogspot.com, ...).
  * It exercises every PSL rule TYPE — exact rules, wildcard rules
  * (`*.ck`), exception rules (`!www.ck`) — so swapping in the full
  * ~9k-rule file is a data-only change to these four sets.
  *
  * Matching follows the PSL algorithm: the longest matching rule wins,
  * exception rules beat wildcards, and the default rule `*` makes any
  * unknown TLD a public suffix. The registrable domain is the public
  * suffix plus one label; a host that IS a public suffix (no extra
  * label) keys as itself, which keeps the column total and non-null —
  * the grouping key choice that matters at 10^12 rows.
  */
object PublicSuffix {

  /** Exact two-label public suffixes (ICANN + common private). */
  val rules2: Set[String] = Set(
    // United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // India
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
    "gov.in", "ac.in", "edu.in", "res.in", "nic.in",
    // Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    // Taiwan / Hong Kong / Singapore
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    // Mexico / Argentina / Colombia / Venezuela
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar",
    "com.co", "net.co", "org.co", "gov.co", "edu.co",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve",
    // South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    // Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr", "gen.tr",
    // Russia / Ukraine / Poland
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua", "kiev.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    // Southeast Asia
    "co.id", "net.id", "or.id", "web.id", "ac.id", "sch.id", "go.id", "my.id",
    "co.th", "in.th", "or.th", "ac.th", "go.th", "net.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "biz.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    // Middle East / Africa
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke",
    // Europe misc
    "co.at", "or.at", "ac.at", "gv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    // private-section user-content suffixes (each customer of the
    // platform is an independent registrant)
    "github.io", "gitlab.io", "blogspot.com", "wordpress.com",
    "tumblr.com", "herokuapp.com", "appspot.com", "netlify.app",
    "vercel.app", "pages.dev", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "fastly.net", "github.dev",
    "glitch.me", "onrender.com", "readthedocs.io", "surge.sh",
    "neocities.org", "weebly.com", "wixsite.com", "myshopify.com",
    "substack.com", "medium.com", "notion.site", "carrd.co"
  )

  /** Exact three-label public suffixes. */
  val rules3: Set[String] = Set(
    "s3.amazonaws.com", "execute-api.us-east-1.amazonaws.com",
    "pvt.k12.ma.us", "chtr.k12.ma.us", "paroch.k12.ma.us",
    "cdn.cloudflare.net", "r2.cloudflarestorage.com",
    "storage.googleapis.com", "blob.core.windows.net"
  )

  /** Wildcard rules `*.tld`: every 2-label suffix under these TLDs is
    * a public suffix.
    */
  val wildcardTlds: Set[String] = Set(
    "bd", "ck", "er", "fj", "jm", "kh", "mm", "np", "pg"
  )

  /** Exception rules `!host`: carve-outs from a wildcard — the listed
    * 2-label host is registrable even though the wildcard would make
    * it a public suffix.
    */
  val exceptions2: Set[String] = Set("www.ck")

  /** Public-suffix label count for a lowercase host split into labels.
    * Longest match wins; exceptions beat wildcards; default rule `*`
    * gives 1.
    */
  private def suffixLabels(labels: Array[String]): Int = {
    val n = labels.length
    if (n >= 2 && exceptions2.contains(labels(n - 2) + "." + labels(n - 1)))
      return 1
    var k = 1
    if (n >= 2 && wildcardTlds.contains(labels(n - 1))) k = 2
    if (k < 2 && n >= 2 &&
      rules2.contains(labels(n - 2) + "." + labels(n - 1))) k = 2
    if (n >= 3 &&
      rules3.contains(labels(n - 3) + "." + labels(n - 2) + "." + labels(n - 1)))
      k = 3
    k
  }

  /** Registrable domain (public suffix + one label) of a lowercase
    * host; the host itself when it has no label beyond the suffix.
    */
  def registrable(host: String): String = {
    if (host == null || host.isEmpty) return host
    val labels = host.split('.')
    val k = suffixLabels(labels)
    val n = labels.length
    if (n > k) labels.slice(n - k - 1, n).mkString(".") else host
  }

  /** Column wrapper over [[StRegistrableDomain]]. */
  def registrableDomain(host: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      StRegistrableDomain(org.apache.spark.sql.GraftBridge.expression(host)))

  /** DuckDB SQL pieces replaying [[registrable]] — generated from the
    * SAME rule sets, so the oracle and the engine cannot drift. Use in
    * staged CTEs: `ls` is a `string_split(host, '.')` list column,
    * `sk` the result of [[skCaseSql]]. Hosts must be lowercase.
    */
  def skCaseSql(ls: String): String = {
    def inList(s: Set[String]): String =
      s.toSeq.sorted.map(x => s"'$x'").mkString("(", ", ", ")")
    // n-label tail of the host via 1-based inclusive list_slice
    def tail(k: Int): String =
      s"array_to_string(list_slice($ls, len($ls) - ${k - 1}, len($ls)), '.')"
    s"""CASE WHEN len($ls) >= 2 AND ${tail(2)} IN ${inList(exceptions2)} THEN 1
       |     WHEN len($ls) >= 3 AND ${tail(3)} IN ${inList(rules3)} THEN 3
       |     WHEN len($ls) >= 2 AND (list_extract($ls, len($ls)) IN ${inList(wildcardTlds)}
       |                             OR ${tail(2)} IN ${inList(rules2)}) THEN 2
       |     ELSE 1 END""".stripMargin
  }

  def domainCaseSql(ls: String, sk: String, host: String): String =
    s"""CASE WHEN len($ls) > $sk
       |     THEN array_to_string(list_slice($ls, len($ls) - $sk, len($ls)), '.')
       |     ELSE $host END""".stripMargin
}

/** host (lowercase string) -> registrable domain. One static-set
  * lookup per row inside whole-stage codegen; no per-row regex, no
  * broadcast — the rule table is a JVM constant.
  */
case class StRegistrableDomain(child: Expression)
    extends UnaryExpression with UnaryKernelCodegen {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "st_registrable_domain"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      PublicSuffix.registrable(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression): StRegistrableDomain =
    copy(child = c)
}
