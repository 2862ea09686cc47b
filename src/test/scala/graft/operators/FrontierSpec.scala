package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** Politeness crawl scheduling (q163): the sort-free schedule must
  * equal the naive global-window total order, and every round must
  * touch each domain at most once.
  */
class FrontierSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def corpus = {
    // skewed: one hot domain with 60 urls, a few medium, many singletons
    val rows = (0 until 60).map(i => (s"https://hot.example/$i", "hot")) ++
      (0 until 9).flatMap(d => (0 until 6).map(i => (s"https://m$d.example/$i", s"m$d"))) ++
      (0 until 40).map(i => (s"https://one$i.example/x", s"one$i"))
    rows.toDF("url", "domain")
  }

  test("schedule equals the single global-window total order") {
    val got = Frontier.schedule(corpus, "url", "domain")
    val naive = got.select(col("url"), col("domain"), col("round"))
      .withColumn("pos2", row_number().over(
        Window.orderBy(col("round").asc, md5(col("url")).asc, col("url").asc)).cast("long"))
    val bad = got.join(naive, Seq("url", "domain", "round"))
      .where(col("pos") =!= col("pos2")).count()
    assert(bad === 0L)
    // positions are a permutation of 1..n
    val n = corpus.count()
    assert(got.select(col("pos")).distinct().count() === n)
    assert(got.agg(min(col("pos")), max(col("pos"))).head() ===
      org.apache.spark.sql.Row(1L, n))
  }

  test("politeness: each domain appears at most once per round") {
    val got = Frontier.schedule(corpus, "url", "domain")
    val dup = got.groupBy(col("round"), col("domain"))
      .agg(count(lit(1)).as("c")).where(col("c") > 1).count()
    assert(dup === 0L)
    // the hot domain's fetches are maximally spaced: round r of hot
    // comes after ALL round r-1 urls of every domain
    val hot = got.where(col("domain") === "hot")
      .orderBy(col("round")).collect().map(r => r.getLong(3))
    assert(hot.length === 60 && hot.sliding(2).forall(p => p(0) < p(1)))
  }

  test("linkEdges and discover: absolute anchors only, duplicates weighted, known urls excluded") {
    val pages = Seq(
      ("https://a.example/1",
        """<html><a href="https://b.example/x">1</a> <a href="https://b.example/x">2</a>
          |<a href="/rel">r</a> <a id="k" href="https://a.example/2">self</a></html>""".stripMargin),
      ("https://a.example/2", """<a href="ftp://c.example/f">f</a>"""),
      ("https://d.example/9", "<p>no links</p>"))
      .toDF("url", "htmlStr")
      .withColumn("html", to_binary(col("htmlStr"), lit("utf-8")))
    val edges = Graph.linkEdges(pages, "html", "url")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(edges === Map(
      ("a.example", "b.example") -> 2L,   // duplicate anchors weight the edge
      ("a.example", "a.example") -> 1L,   // self-host link
      ("a.example", "c.example") -> 1L))  // ftp scheme is absolute too
    val frontier = Frontier.discover(pages, "html", "url")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // https://a.example/2 is in the corpus -> not frontier
    assert(frontier === Map(
      "https://b.example/x" -> 2L,
      "ftp://c.example/f" -> 1L))
  }

  test("pathPrefixes: nesting, depth clamp, rootless and trailing-slash urls") {
    val rows = Seq(
      "https://a.example/x/y/z/w",
      "https://a.example/x/",
      "https://a.example",       // no path -> no prefixes
      "https://a.example/x/y?q=1#f")
      .toDF("url")
      .withColumn("p", TextOps.pathPrefixes(col("url"), 3))
    val got = rows.collect().map(_.getSeq[String](1).toList)
    assert(got(0) === List("/x/", "/x/y/", "/x/y/z/")) // depth clamped at 3
    assert(got(1) === List("/x/"))
    assert(got(2) === Nil)
    assert(got(3) === List("/x/", "/x/y/")) // query/fragment stripped
  }

  test("anchorTermIndex drops relative-link anchors and counts duplicates") {
    val pages = Seq(
      """<a href="https://b.example/x">big fish</a> <a href="/rel">skip me</a>
        |<a id="z" href="https://b.example/y">big pond</a>""".stripMargin)
      .toDF("htmlStr")
      .withColumn("html", to_binary(col("htmlStr"), lit("utf-8")))
    val got = Graph.anchorTermIndex(pages, "html")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got === Map(
      ("b.example", "big") -> 2L,
      ("b.example", "fish") -> 1L,
      ("b.example", "pond") -> 1L))
  }

  test("schedule is partitioning-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Frontier.schedule(df, "url", "domain")
        .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(run(corpus.repartition(1)) === run(corpus.repartition(7, col("url"))))
  }
}
