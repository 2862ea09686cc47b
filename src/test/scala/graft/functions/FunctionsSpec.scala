package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Wkb, Wkt}
import graft.functions.ST._

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    ST.registerAll(s)
    s
  }
}

class FunctionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("scalar ST expressions end to end") {
    val df = Seq(
      ("POLYGON((0 0,4 0,4 4,0 4,0 0))", 1),
      ("POINT(1 2)", 2),
      ("LINESTRING(0 0,3 4)", 3)
    ).toDF("wkt", "id")
      .withColumn("g", st_geomFromWKT($"wkt"))

    val rows = df.select(
      $"id",
      st_area($"g").as("area"),
      st_length($"g").as("len"),
      st_geometryType($"g").as("typ"),
      st_asText($"g").as("txt"),
      st_xmin($"g").as("xmin"),
      st_dimension($"g").as("dim")
    ).orderBy($"id").collect()

    assert(rows(0).getDouble(1) == 16.0)
    assert(rows(0).getString(3) == "Polygon")
    assert(rows(0).getString(4) == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(rows(1).getInt(6) == 0)
    assert(rows(2).getDouble(2) == 5.0)
  }

  test("predicates as join conditions") {
    val polys = Seq(
      (1, "POLYGON((0 0,10 0,10 10,0 10,0 0))"),
      (2, "POLYGON((20 20,30 20,30 30,20 30,20 20))")
    ).toDF("pid", "pwkt").withColumn("pg", st_geomFromWKT($"pwkt"))
    val pts = Seq((100, 5.0, 5.0), (101, 25.0, 25.0), (102, 50.0, 50.0))
      .toDF("ptid", "x", "y").withColumn("pt", st_point($"x", $"y"))

    val joined = pts.join(broadcast(polys), st_contains($"pg", $"pt"))
      .select($"ptid", $"pid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(joined == Set((100, 1), (101, 2)))
  }

  test("SQL registration") {
    val out = spark.sql(
      """SELECT st_area(st_geomfromwkt('POLYGON((0 0,2 0,2 2,0 2,0 0))')) AS a,
        |       st_astext(st_centroid(st_geomfromwkt('POLYGON((0 0,2 0,2 2,0 2,0 0))'))) AS c,
        |       st_relate(st_geomfromwkt('POINT(1 1)'),
        |                 st_geomfromwkt('POLYGON((0 0,2 0,2 2,0 2,0 0))')) AS r
        |""".stripMargin).collect()(0)
    assert(out.getDouble(0) == 4.0)
    assert(out.getString(1) == "POINT(1 1)")
    assert(out.getString(2) == "0FFFFF212")
  }

  test("lenient parse nulls malformed rows") {
    val df = Seq("POINT(1 2)", "NOT A WKT", "LINESTRING(0 0,1 1)").toDF("w")
    val n = df.select(st_tryGeomFromWKT($"w").as("g")).filter($"g".isNotNull).count()
    assert(n == 2)
    assertThrows[Exception] {
      df.select(st_geomFromWKT($"w").as("g")).collect()
    }
  }

  test("cell tiling expressions") {
    val df = Seq((0.0, 0.0), (10.0, 48.0), (-74.0, 40.7)).toDF("lon", "lat")
      .withColumn("cell", st_cellOf($"lon", $"lat", lit(12)))
    val cells = df.select($"cell").collect().map(_.getLong(0))
    assert(cells.distinct.length == 3)
    // geom of the cell must contain the point that produced it
    val ok = df.withColumn("cg", st_cellGeom($"cell"))
      .withColumn("inside", st_intersects($"cg", st_point($"lon", $"lat")))
      .agg(sum(when($"inside", 1).otherwise(0))).collect()(0).getLong(0)
    assert(ok == 3)
  }

  test("clip by box and intersection") {
    val out = spark.sql(
      """SELECT st_area(st_clipbybox(st_geomfromwkt('POLYGON((0 0,4 0,4 4,0 4,0 0))'),
        |                            2.0D, 2.0D, 6.0D, 6.0D)) AS a,
        |       st_area(st_intersection(
        |          st_geomfromwkt('POLYGON((0 0,4 0,4 4,0 4,0 0))'),
        |          st_geomfromwkt('POLYGON((2 2,6 2,6 6,2 6,2 2))'))) AS b
        |""".stripMargin).collect()(0)
    assert(out.getDouble(0) == 4.0)
    assert(out.getDouble(1) == 4.0)
  }

  test("aggregators: envelope, hull, collect") {
    val df = Seq((1, "POINT(0 0)"), (1, "POINT(4 0)"), (1, "POINT(4 4)"), (1, "POINT(0 4)"),
      (2, "POINT(10 10)"))
      .toDF("k", "w").withColumn("g", st_geomFromWKT($"w"))
    df.createOrReplaceTempView("pts_agg")
    val rows = spark.sql(
      """SELECT k, st_astext(st_envelope_agg(g)) AS env,
        |       st_area(st_convexhull_agg(g)) AS hull_area,
        |       st_numgeometries(st_collect_agg(g)) AS n
        |FROM pts_agg GROUP BY k ORDER BY k""".stripMargin).collect()
    assert(rows(0).getString(1) == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(rows(0).getDouble(2) == 16.0)
    assert(rows(0).getInt(3) == 4)
    assert(rows(1).getString(1) == "POINT(10 10)")
  }

  test("st_dump via explode") {
    val df = Seq("MULTIPOLYGON(((0 0,1 0,0 1,0 0)),((5 5,6 5,5 6,5 5)))").toDF("w")
    val parts = df.select(explode(st_dumpArray(st_geomFromWKT($"w"))).as("part"))
      .select(st_asText($"part")).collect().map(_.getString(0))
    assert(parts.length == 2)
    assert(parts.forall(_.startsWith("POLYGON")))
  }

  test("projection round trip") {
    val df = Seq(("POINT(10 45)", "webmercator")).toDF("w", "p")
    val back = df.select(
      st_asText(st_project(st_project(st_geomFromWKT($"w"), $"p"), concat($"p", lit(":inv")))))
      .collect()(0).getString(0)
    val pt = Wkt.parse(back).asInstanceOf[graft.core.GPoint]
    assert(math.abs(pt.x - 10) < 1e-9 && math.abs(pt.y - 45) < 1e-9)
  }
}

class AggregatorSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("st_collect_agg preserves Z/M and sorts deterministically across partition orders") {
    val wkts = Seq("POINT Z(3 4 5)", "POINT Z(1 2 9)", "POINT Z(7 8 1)")
    def collect(order: Seq[String]): String = {
      val df = order.zipWithIndex.toDF("wkt", "i").repartition(3)
        .withColumn("g", st_geomFromWKT($"wkt"))
      Wkt.write(Wkb.read(
        df.agg(st_collectAgg($"g")).collect()(0).getAs[Array[Byte]](0)))
    }
    val a = collect(wkts)
    val b = collect(wkts.reverse)
    assert(a == b)
    assert(a.startsWith("MULTIPOINT Z"), s"Z dropped: $a")
    // mixed ct degrades to the common type (XYZ meet XYM = XY)
    val mixed = Seq("POINT Z(1 2 3)", "POINT M(4 5 6)").toDF("wkt")
      .withColumn("g", st_geomFromWKT($"wkt"))
    val m = Wkt.write(Wkb.read(
      mixed.agg(st_collectAgg($"g")).collect()(0).getAs[Array[Byte]](0)))
    // sort key is the raw input WKB (type code included), so the M
    // point (code 2001) precedes the Z point (code 1001) byte-wise
    assert(m == "MULTIPOINT((4 5),(1 2))")
  }

  test("st_union_agg cascaded batching matches pairwise union across many rows and partitionings") {
    // 150 overlapping unit squares along a line: union area is exactly
    // n + 1 - n*overlap ... simpler: squares [i*0.5, i*0.5+1]^1 overlap
    // by 0.5 => union is a staircase of area 1 + 0.5*(n-1)
    val n = 150
    val wkts = (0 until n).map { i =>
      val x = i * 0.5
      s"POLYGON(($x 0,${x + 1} 0,${x + 1} 1,$x 1,$x 0))"
    }
    for (parts <- Seq(1, 7)) {
      val df = wkts.toDF("wkt").repartition(parts)
        .withColumn("g", st_geomFromWKT($"wkt"))
      val u = Wkb.read(df.agg(st_unionAgg($"g")).collect()(0).getAs[Array[Byte]](0))
      assert(math.abs(graft.core.Measure.area(u) - (1 + 0.5 * (n - 1))) < 1e-9)
      assert(u.typeCode == 3, s"expected single Polygon, got ${u.typeCode}")
    }
  }
}

/** Typed constructors from coordinate arrays + GeoJSON foreign members
  * (reference: geom/ctor_from_coords.go:9-340,
  * geom/geojson_feature_collection.go:76-139).
  */
class CtorAndFeatureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.Row

  private def wktOf(df: org.apache.spark.sql.DataFrame): String =
    Wkt.write(Wkb.read(df.collect()(0).getAs[Array[Byte]](0)))

  test("st_makePoint XY/XYZ/XYZM and st_makePointM") {
    val df = Seq(1).toDF("i")
    assert(wktOf(df.select(st_makePoint(lit(1.0), lit(2.0)))) == "POINT(1 2)")
    assert(wktOf(df.select(st_makePoint(lit(1.0), lit(2.0), lit(3.0)))) == "POINT Z (1 2 3)")
    assert(wktOf(df.select(st_makePoint(lit(1), lit(2), lit(3), lit(4)))) == "POINT ZM (1 2 3 4)")
    assert(wktOf(df.select(st_makePointM(lit(1.0), lit(2.0), lit(9.0)))) == "POINT M (1 2 9)")
  }

  test("st_makeLine / st_makeMultiPoint from array columns, XY and XYZ") {
    val df = Seq(1).toDF("i")
    val xy = array(array(lit(0.0), lit(0.0)), array(lit(3.0), lit(4.0)))
    assert(wktOf(df.select(st_makeLine(xy))) == "LINESTRING(0 0,3 4)")
    val xyz = array(array(lit(0.0), lit(0.0), lit(5.0)), array(lit(3.0), lit(4.0), lit(6.0)))
    assert(wktOf(df.select(st_makeLine(xyz, lit("XYZ")))) == "LINESTRING Z (0 0 5,3 4 6)")
    assert(wktOf(df.select(st_makeMultiPoint(xy))) == "MULTIPOINT((0 0),(3 4))")
    // SQL registry path + measurement on the constructed geometry
    ST.registerAll(spark)
    val len = spark.sql(
      "SELECT st_length(st_makeline(array(array(0.0d,0.0d),array(3.0d,4.0d))))").collect()(0).getDouble(0)
    assert(len == 5.0)
  }

  test("st_makePolygon with hole from nested arrays") {
    val df = Seq(1).toDF("i")
    def ring(pts: (Double, Double)*) =
      array(pts.map(p => array(lit(p._1), lit(p._2))): _*)
    val rings = array(
      ring((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)),
      ring((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0)))
    val out = df.select(st_area(st_makePolygon(rings)).as("a")).collect()(0).getDouble(0)
    assert(out == 96.0)
    // ordinate-count mismatch is an error, not silent truncation
    intercept[Exception] {
      df.select(st_makeLine(array(array(lit(1.0))))).collect()
    }
  }

  test("GeoJSON feature foreign members round-trip") {
    val fjson = """{"type":"Feature","id":"x1","bbox":[0,0,2,2],"custom":{"k":1},
      "geometry":{"type":"Point","coordinates":[1,2]},"properties":{"p":7}}"""
    val f = graft.core.GeoJson.parseFeature(fjson)
    assert(f.id.contains("x1"))
    assert(f.foreignMembers.contains("\"bbox\"") && f.foreignMembers.contains("\"custom\""))
    val written = graft.core.GeoJson.writeFeature(f)
    val f2 = graft.core.GeoJson.parseFeature(written)
    assert(f2.foreignMembers == f.foreignMembers && f2.properties == f.properties)
    // forbidden foreign member rejected at write time
    intercept[Exception] {
      graft.core.GeoJson.writeFeature(f.copy(foreignMembers = """{"geometry":1}"""))
    }
    // expression surface
    val got = Seq(fjson).toDF("j")
      .select(expr("st_featureforeignmembers(j)")).collect()(0).getString(0)
    assert(got.contains("\"custom\":{\"k\":1}"))
  }

  test("envelope width/height/area/center/distance with reference empty semantics") {
    // reference geom/type_envelope.go:188-246: width/height/area 0 for
    // empty, center is the empty point, distance undefined -> null;
    // distance 0 when boxes intersect, straight-line gap otherwise
    val df = Seq(
      ("POLYGON((1 2,5 2,5 10,1 10,1 2))", "POLYGON((2 3,3 3,3 4,2 4,2 3))"), // overlap
      ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POLYGON((5 6,7 6,7 8,5 8,5 6))"),   // diagonal gap
      ("POLYGON((0 0,2 0,2 2,0 2,0 0))", "POINT EMPTY")                        // empty rhs
    ).toDF("aw", "bw")
      .withColumn("a", st_geomFromWKT($"aw"))
      .withColumn("b", st_geomFromWKT($"bw"))
    val rows = df.select(
      expr("st_envwidth(a)"), expr("st_envheight(a)"), expr("st_envarea(a)"),
      expr("st_x(st_envcenter(a))"), expr("st_y(st_envcenter(a))"),
      expr("st_envdistance(a, b)"), expr("st_isempty(st_envcenter(b))")).collect()
    assert(rows(0).getDouble(0) === 4.0 && rows(0).getDouble(1) === 8.0)
    assert(rows(0).getDouble(2) === 32.0)
    assert(rows(0).getDouble(3) === 3.0 && rows(0).getDouble(4) === 6.0)
    assert(rows(0).getDouble(5) === 0.0) // intersecting boxes
    assert(rows(1).getDouble(5) === 5.0) // 3-4-5 diagonal gap
    assert(rows(2).isNullAt(5))          // empty side -> undefined
    assert(rows(2).getBoolean(6))        // center of empty -> empty point
    // empty geometry: width/height/area are 0, not null
    val e = df.filter($"bw" === "POINT EMPTY")
      .select(expr("st_envwidth(b)"), expr("st_envarea(b)")).collect()(0)
    assert(e.getDouble(0) === 0.0 && e.getDouble(1) === 0.0)
  }

  test("st_affine: coordinate map, Z/M carry, inverse composition") {
    val df = Seq(
      "POLYGON Z((0 0 7,4 0 8,4 4 9,0 4 10,0 0 7))",
      "LINESTRING M(1 2 5,3 4 6)",
      "POINT(2 3)"
    ).toDF("w").withColumn("g", st_geomFromWKT($"w"))
    // forward x' = 2x + y + 10, y' = 1.5x + y - 20 (det 0.5); the
    // inverse x = 2x' - 2y' - 60, y = -3x' + 4y' + 110 has all-dyadic
    // coefficients, so the composition is bit-exact on these inputs
    val rows = df.select(
      expr("st_x(st_affine(g, 2.0d, 1.0d, 1.5d, 1.0d, 10.0d, -20.0d))").as("px"),
      expr("st_y(st_affine(g, 2.0d, 1.0d, 1.5d, 1.0d, 10.0d, -20.0d))").as("py"),
      expr("""st_affine(st_affine(g, 2.0d, 1.0d, 1.5d, 1.0d, 10.0d, -20.0d),
              2.0d, -2.0d, -3.0d, 4.0d, -60.0d, 110.0d)""").as("roundtrip"),
      $"g",
      st_geometryType($"g").as("typ"),
      st_coordDim($"g").as("cd")).collect()
    // POINT(2 3) -> (2*2+3+10, 1.5*2+3-20) = (17, -14)
    assert(rows(2).getDouble(0) === 17.0 && rows(2).getDouble(1) === -14.0)
    // inverse composition is the identity, byte-for-byte, and Z/M
    // coordinate types are carried through both transforms
    for (r <- rows) {
      assert(java.util.Arrays.equals(
        r.getAs[Array[Byte]]("roundtrip"), r.getAs[Array[Byte]]("g")))
    }
    assert(rows(0).getInt(5) === 3 && rows(1).getInt(5) === 3) // XYZ / XYM
  }
}
