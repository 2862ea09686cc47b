package graft.api

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** The input-contract page row: Common-Crawl-style
  * (url, warc_ts, html binary, text, lang).
  */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** A geotagged page: coordinates parsed from the URL and the equirect
  * grid cell they fall in.
  */
final case class GeoPage(
    url: String,
    lang: String,
    text: String,
    lon: Double,
    lat: Double,
    cell: Long)

/** Typed Dataset facade over the page pipeline: the operators a user
  * of the DataFrame layer gets, expressed as Dataset[Page] →
  * Dataset[GeoPage] transforms with case-class Encoders. Every
  * transform compiles to the same codegen'd Column expressions as the
  * untyped layer — the typed surface adds compile-time row shape, not
  * a serialization tax (no .map on JVM objects in the hot path).
  */
object Typed {

  /** Fill `text` by extracting the main text from the html payload
    * (boilerplate dropped, tags stripped, entities unescaped) —
    * byte-identical to the pre-render text; see
    * [[graft.operators.TextOps.extractHtmlText]].
    */
  def extractText(pages: Dataset[Page]): Dataset[Page] = {
    import pages.sparkSession.implicits._
    pages.toDF()
      .withColumn("text", TextOps.extractHtmlText(col("html")))
      .as[Page]
  }

  /** Geotag pages whose URL carries `?lat=<f>&lon=<f>` query
    * parameters (the geotagged-URL convention from the north star);
    * pages without parseable coordinates are dropped. `cell` is the
    * packed equirect grid cell at `level` (the same
    * 2^level x 2^level [-180,180] x [85,-85] grid the kNN join uses),
    * the shuffle/partition key for everything downstream.
    */
  def geoTag(pages: Dataset[Page], level: Int = 6): Dataset[GeoPage] = {
    import pages.sparkSession.implicits._
    require(level >= 1 && level <= 30, "level out of range")
    val side = 1 << level
    val num = "(-?[0-9]+(?:\\.[0-9]+)?)"
    // regexp_extract returns "" on no match; the regex admits only
    // valid doubles otherwise, so nullif-then-cast is ANSI-safe
    def coord(param: String) = {
      val s = regexp_extract(col("url"), s"[?&]$param=$num", 1)
      nullif(s, lit("")).cast("double")
    }
    val lon = coord("lon")
    val lat = coord("lat")
    val ix = least(lit(side - 1L), greatest(lit(0L),
      floor((col("lon") + 180.0) / 360.0 * side).cast("long")))
    val iy = least(lit(side - 1L), greatest(lit(0L),
      floor((lit(85.0) - col("lat")) / 170.0 * side).cast("long")))
    pages.toDF()
      .withColumn("lon", lon)
      .withColumn("lat", lat)
      .filter(col("lon").isNotNull && col("lat").isNotNull)
      .select(col("url"), col("lang"), col("text"), col("lon"), col("lat"),
        (ix * side + iy).as("cell"))
      .as[GeoPage]
  }
}
