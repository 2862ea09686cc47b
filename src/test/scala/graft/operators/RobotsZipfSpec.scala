package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession

/** robots.txt Disallow parsing/matching (q144) and the Zipf
  * rank-frequency slope (q146).
  */
class RobotsZipfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def rules(robots: String): Seq[String] =
    Seq(robots).toDF("r")
      .select(TextOps.robotsDisallows(col("r")).as("d"))
      .as[Seq[String]].head()

  test("robotsDisallows: case-insensitive, whitespace-tolerant, empties dropped") {
    assert(rules("User-agent: *\nDisallow: /a/\nDISALLOW:\t/b\ndisallow:\nAllow: /c\n")
      === Seq("/a/", "/b"))
    assert(rules("Crawl-delay: 5") === Seq.empty)
    assert(rules("") === Seq.empty)
    // "Allow:" must not feed the Disallow list even though it ends in "allow:"
    assert(rules("Allow: /x/") === Seq.empty)
  }

  test("robotsBlocked is a prefix match") {
    val df = Seq(
      ("/private/doc-1", true), ("/privateer", true), // prefix, not segment, per RFC
      ("/pub/doc-2", false), ("/", false)).toDF("path", "want")
      .withColumn("d", typedLit(Seq("/private", "/tmp/x")))
      .withColumn("got", TextOps.robotsBlocked(col("d"), col("path")))
    assert(df.where(col("got") =!= col("want")).count() === 0)
  }

  test("zipf slope recovers an exact power law") {
    // freq(rank) = 2^20 / rank for rank 1..16: slope must be ~-1
    val words = (1 to 16).flatMap(r => Seq.fill((1 << 20) / r / 4096)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("k", "text")
      .withColumn("grp", lit("g"))
    val out = Corpus.zipfSlope(docs, "text", "grp", topR = 16).collect()
    assert(out.length === 1)
    val slope = out.head.getAs[Double]("slope")
    assert(math.abs(slope + 1.0) < 0.01, s"slope $slope")
  }

  test("zipf slope is exact-integer stable under repartitioning") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))
    val a = Corpus.zipfSlope(docs, "text", "source", topR = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val b = Corpus.zipfSlope(docs.repartition(13), "text", "source", topR = 30)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b && a.nonEmpty)
  }
}
