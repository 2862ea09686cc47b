package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SparkTestSession
import graft.operators.TextOps

/** Typed Dataset[Page] surface: extractText recovers the original
  * text byte-identically, geoTag parses URL coordinates and encodes
  * the partition cell, and pages without coordinates are dropped —
  * with the typed plan staying on codegen'd Column expressions (no
  * DeserializeToObject in the optimized plan).
  */
class TypedSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private def mkPages(rows: Seq[(String, String, String)]) = {
    val df = rows.toDF("url", "text0", "lang")
      .select(col("url"),
        lit(ts).as("warc_ts"),
        TextOps.renderHtml(col("text0"), col("url")).as("html"),
        lit("").as("text"),
        col("lang"))
    df.as[Page]
  }

  test("extractText recovers original text byte-identically") {
    val pages = mkPages(Seq(
      ("https://a/1?lat=10.5&lon=-3.25", "hello < world & co", "en"),
      ("https://a/2", "zweiter text", "de")))
    val out = Typed.extractText(pages).collect()
    assert(out.map(_.text).toSet === Set("hello < world & co", "zweiter text"))
  }

  test("geoTag parses coordinates, encodes cell, drops untagged pages") {
    val pages = Typed.extractText(mkPages(Seq(
      ("https://a/1?lat=0.5&lon=0.5", "t1", "en"),
      ("https://a/2?lon=-179.75&lat=-84.75", "t2", "en"), // reversed param order
      ("https://a/3", "untagged", "en"),
      ("https://a/4?lat=91.0&lon=400.0", "clamped", "en"))))
    val out = Typed.geoTag(pages, level = 6).collect().map(g => g.url -> g).toMap
    assert(out.size === 3)
    val g1 = out("https://a/1?lat=0.5&lon=0.5")
    assert(g1.lon === 0.5 && g1.lat === 0.5)
    // ix = floor((0.5+180)/360*64) = 32, iy = floor((85-0.5)/170*64) = 31
    assert(g1.cell === 32L * 64 + 31)
    val g2 = out("https://a/2?lon=-179.75&lat=-84.75")
    assert(g2.lon === -179.75 && g2.lat === -84.75)
    assert(g2.cell === 0L * 64 + 63)
    // out-of-range coordinates clamp to edge cells (never dropped)
    assert(out("https://a/4?lat=91.0&lon=400.0").cell === 63L * 64 + 0)
  }

  test("typed pipeline plan has no object (de)serialization in the hot path") {
    val pages = mkPages(Seq(("https://a/1?lat=1.0&lon=2.0", "t", "en")))
    val plan = Typed.geoTag(Typed.extractText(pages), 6)
      .toDF() // consume as a DataFrame, as the pipeline does
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapElements"),
      s"typed surface fell off codegen:\n$plan")
  }
}
