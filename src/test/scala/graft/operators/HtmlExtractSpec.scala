package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** The north-rule per-row invariant: text rendered into a Common-
  * Crawl-style page (boilerplate + entity escaping) and re-extracted
  * must be BYTE-identical to the original, for any input — including
  * text that contains raw HTML, entities, unicode, and newlines.
  */
class HtmlExtractSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val gnarly = Seq(
    "plain ascii words",
    "",
    "a < b && b > c",
    "literal &amp; entity and &lt;tag&gt; text",
    "<script>alert('xss')</script>",
    "multi\nline\n\ttext with  double  spaces",
    "unicode: café 日本語 😀",
    "<html><body>nested page</body></html>",
    "&&&<<<>>>&amp;&lt;",
    "trailing newline\n")

  test("render -> extract round-trips byte-identically") {
    val df = gnarly.zipWithIndex.map(_.swap).toDF("id", "text")
      .withColumn("url", concat(lit("https://x.example/"), col("id")))
      .withColumn("html", TextOps.renderHtml(col("text"), col("url")))
      .withColumn("extracted", TextOps.extractHtmlText(col("html")))
    val rows = df.select("text", "extracted").collect()
    rows.foreach { r =>
      assert(r.getString(1) === r.getString(0),
        s"extraction drift for input ${r.getString(0).take(40)}")
    }
  }

  test("html column is binary and boilerplate is actually present") {
    val df = Seq((1, "body text here")).toDF("id", "text")
      .withColumn("html", TextOps.renderHtml(col("text"), lit("https://x/1")))
    val bytes = df.select("html").head.getAs[Array[Byte]](0)
    val s = new String(bytes, "UTF-8")
    assert(s.contains("<script>") && s.contains("<nav>") &&
      s.contains("<footer>") && s.contains("<style>"))
    // extraction drops every boilerplate fragment
    val ext = df.select(TextOps.extractHtmlText(col("html"))).head.getString(0)
    assert(ext === "body text here")
    assert(!ext.contains("home") && !ext.contains("copy"))
  }

  test("extraction survives boilerplate-free and attribute-heavy pages") {
    val pages = Seq(
      "<html><body><p>no head at all</p></body></html>" -> "no head at all",
      "<div class=\"a\" data-x=\"1<2\">attr page</div>" -> "attr page",
      "text only, no tags" -> "text only, no tags")
    val df = pages.toDF("html_s", "expected")
      .withColumn("html", to_binary(col("html_s"), lit("utf-8")))
      .withColumn("extracted", TextOps.extractHtmlText(col("html")))
    df.select("extracted", "expected").collect().foreach { r =>
      assert(r.getString(0) === r.getString(1))
    }
  }
}
