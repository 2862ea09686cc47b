package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** URL parsing/normalization edge cases beyond the q90 oracle's three
  * synthetic shapes, plus split-assignment distribution/stability and
  * word-repetition degeneracies.
  */
class UrlSplitSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def urlRow(u: String): (String, String, String, Int, String) = {
    val r = Seq(u).toDF("url").select(
      TextOps.urlHost(col("url")),
      TextOps.urlDomain(col("url")),
      TextOps.urlPath(col("url")),
      TextOps.urlPathDepth(col("url")),
      TextOps.urlNormalize(col("url"))).head()
    (r.getString(0), r.getString(1), r.getString(2), r.getInt(3), r.getString(4))
  }

  test("urlNormalize strips default ports, keeps non-default, drops fragment") {
    assert(urlRow("http://A.B.example.com:80/x#f") ===
      (("a.b.example.com", "example.com", "/x", 1, "http://a.b.example.com/x")))
    assert(urlRow("https://ex.org:443/") ===
      (("ex.org", "ex.org", "/", 0, "https://ex.org/")))
    assert(urlRow("https://ex.org:8443/a/b/c?k=v&x=2#frag") ===
      (("ex.org", "ex.org", "/a/b/c", 3, "https://ex.org:8443/a/b/c?k=v&x=2")))
    // no path at all -> "/" and root slash is preserved
    assert(urlRow("HTTP://EX.ORG") === (("ex.org", "ex.org", "/", 0, "http://ex.org/")))
    // query on bare host, plus empty path segments don't count
    assert(urlRow("https://ex.org?q=1") ===
      (("ex.org", "ex.org", "/", 0, "https://ex.org/?q=1")))
    assert(urlRow("https://ex.org//a//b/") ===
      (("ex.org", "ex.org", "//a//b/", 2, "https://ex.org//a//b")))
    // a '?' INSIDE the fragment is fragment content, not a query: it
    // must not leak into the canonical key (regression: the query
    // regex was unanchored and matched the first '?' anywhere)
    assert(urlRow("https://ex.org/a#sec?b=1") ===
      (("ex.org", "ex.org", "/a", 1, "https://ex.org/a")))
    assert(urlRow("https://ex.org/a?q=1#sec?b=2") ===
      (("ex.org", "ex.org", "/a", 1, "https://ex.org/a?q=1")))
  }

  test("splitAssign is deterministic, total, and near the target fractions") {
    val ids = spark.range(0, 20000).toDF("id")
    val assigned = ids.withColumn("s", TextOps.splitAssign(col("id")))
    val counts = assigned.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 20000L)
    assert(math.abs(counts("train") / 20000.0 - 0.8) < 0.02)
    assert(math.abs(counts("val") / 20000.0 - 0.1) < 0.01)
    assert(math.abs(counts("test") / 20000.0 - 0.1) < 0.01)
    // stability: the same key keeps its split in a differently-sized,
    // differently-partitioned corpus (the property random() lacks)
    val again = spark.range(0, 5000).repartition(7).toDF("id")
      .withColumn("s2", TextOps.splitAssign(col("id")))
    val joined = assigned.join(again, "id")
      .filter(col("s") =!= col("s2")).count()
    assert(joined === 0L)
  }

  test("piiScrub: redacts and counts emails/phones/IPs; clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.co.uk now"),          // one email
      (2L, "call +44 123 4567890 or +1 555 0100 today"), // two phones
      (3L, "from 10.0.0.1 to 192.168.255.254"),          // two IPs
      (4L, "nothing sensitive here"),                    // clean
      (5L, ""),                                          // empty
      (6L, "x@y.io a@b.org 1.2.3.4 +7 999 1234")         // mixed
    ).toDF("id", "text").withColumn("p", TextOps.piiScrub(col("text")))
    val m = df.select(col("id"), col("p.clean"), col("p.n_email"),
        col("p.n_phone"), col("p.n_ip"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(m(1L) === (("mail <EMAIL> now", 1, 0, 0)))
    assert(m(2L) === (("call <PHONE> or <PHONE> today", 0, 2, 0)))
    assert(m(3L) === (("from <IP> to <IP>", 0, 0, 2)))
    assert(m(4L) === (("nothing sensitive here", 0, 0, 0)))
    assert(m(5L) === (("", 0, 0, 0)))
    assert(m(6L) === (("<EMAIL> <EMAIL> <IP> <PHONE>", 2, 1, 1)))
    // a bare national-format number and a 3-part version string are NOT
    // redacted (no false positives on version strings / plain numbers)
    val r = Seq((7L, "v1.2.3 released; ring 555 0100 x"))
      .toDF("id", "text").select(TextOps.piiScrub(col("text")).as("p"))
      .select(col("p.n_phone"), col("p.n_ip")).head()
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) === 0)
  }

  test("registrable domain: PSL exact, wildcard, exception, default rules") {
    val f = PublicSuffix.registrable _
    // multi-label ccTLD suffixes (the VERDICT's bbc.co.uk class)
    assert(f("news.bbc.co.uk") === "bbc.co.uk")
    assert(f("www.bbc.co.uk") === "bbc.co.uk")
    assert(f("bbc.co.uk") === "bbc.co.uk")
    assert(f("example.com.au") === "example.com.au")
    assert(f("a.b.c.example.gov.br") === "example.gov.br")
    // plain gTLD: last two labels
    assert(f("www.example.com") === "example.com")
    assert(f("example.com") === "example.com")
    // private user-content suffixes: each user is a registrant
    assert(f("alice.github.io") === "alice.github.io")
    assert(f("www.alice.github.io") === "alice.github.io")
    assert(f("bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
    assert(f("x.bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
    // wildcard *.ck: any 2-label suffix under ck is public
    assert(f("www.anything.ck") === "www.anything.ck")
    assert(f("deep.www.anything.ck") === "www.anything.ck")
    // exception !www.ck beats the wildcard
    assert(f("www.ck") === "www.ck")
    assert(f("foo.www.ck") === "www.ck")
    // unknown TLD: default rule * -> last two labels
    assert(f("www.example.zz") === "example.zz")
    // host that IS a public suffix keys as itself
    assert(f("co.uk") === "co.uk")
    assert(f("com") === "com")
    assert(f("") === "")
    // Column path agrees with the Scala function
    val hosts = Seq("news.bbc.co.uk", "alice.github.io", "foo.www.ck")
    val got = hosts.toDF("h")
      .select(PublicSuffix.registrableDomain(col("h"))).as[String].collect()
    assert(got.toSeq === hosts.map(f))
  }

  test("urlRegistrableDomain vs naive urlDomain") {
    val r = Seq("https://news.bbc.co.uk/x").toDF("url").select(
      TextOps.urlRegistrableDomain(col("url")),
      TextOps.urlDomain(col("url"))).head()
    assert(r.getString(0) === "bbc.co.uk")
    assert(r.getString(1) === "co.uk") // the naive key is wrong here
  }

  test("wordRepetition: distinct text, fully-repeated text, single token") {
    val df = Seq(
      (1L, "a b c d"),        // all distinct
      (2L, "x x x x"),        // one token repeated
      (3L, "w"),              // single token
      (4L, "a b a b a b")     // dup_frac 2/3, top_share 1/2
    ).toDF("id", "text").withColumn("r", TextOps.wordRepetition(col("text")))
    val m = df.select(col("id"), col("r.dup_frac"), col("r.top_share"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m(1L) === ((0.0, 0.25)))
    assert(m(2L) === ((0.75, 1.0)))
    assert(m(3L) === ((0.0, 1.0)))
    assert(m(4L)._1 > 0.666 && m(4L)._1 < 0.667)
    assert(m(4L)._2 === 0.5)
  }
}
