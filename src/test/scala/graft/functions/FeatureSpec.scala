package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ST._
import graft.core.{GeoJson, Algos, Wkt}

class FeatureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("GeoJSON Feature round-trip through expressions") {
    val fc = """{"type":"FeatureCollection","features":[
      {"type":"Feature","id":"a1","geometry":{"type":"Point","coordinates":[1,2]},
       "properties":{"name":"alpha","rank":3}},
      {"type":"Feature","geometry":{"type":"LineString","coordinates":[[0,0],[1,1]]},
       "properties":null}]}""".replaceAll("\n\\s*", "")
    val rows = Seq(fc).toDF("json")
      .select(explode(st_features($"json")).as("f"))
      .select(
        st_featureId($"f").as("id"),
        st_asText(st_featureGeometry($"f")).as("wkt"),
        st_featureProperties($"f").as("props"))
      .collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "a1")
    assert(rows(0).getString(1) == "POINT(1 2)")
    assert(rows(0).getString(2).contains("\"name\":\"alpha\"") &&
      rows(0).getString(2).contains("\"rank\":3"))
    assert(rows(1).getString(0) == null)
    assert(rows(1).getString(2) == "{}")

    // writer: geom + props + id -> Feature JSON, re-parses to same parts
    val back = Seq(("POINT(5 6)", """{"k":1}""", "idz")).toDF("wkt", "p", "i")
      .select(st_asGeoJSONFeature(st_geomFromWKT($"wkt"), $"p", $"i").as("f"))
      .select(st_featureId($"f"), st_asText(st_featureGeometry($"f")),
        st_featureProperties($"f"))
      .first()
    assert(back.getString(0) == "idz")
    assert(back.getString(1) == "POINT(5 6)")
    assert(back.getString(2) == """{"k":1}""")
  }

  test("evenly spaced interpolated points") {
    val l = Wkt.parse("LINESTRING(0 0,10 0)").asInstanceOf[graft.core.GLine]
    assert(Wkt.write(Algos.interpolateEvenly(l.seq, 0)) == "MULTIPOINT EMPTY")
    assert(Wkt.write(Algos.interpolateEvenly(l.seq, 1)) == "MULTIPOINT((5 0))")
    assert(Wkt.write(Algos.interpolateEvenly(l.seq, 3)) == "MULTIPOINT((0 0),(5 0),(10 0))")
    // through the expression + dump
    val n = Seq("LINESTRING(0 0,4 0,4 4)").toDF("wkt")
      .select(st_numGeometries(st_interpolatedPoints(st_geomFromWKT($"wkt"), lit(5))))
      .first().getInt(0)
    assert(n == 5)
  }
}
