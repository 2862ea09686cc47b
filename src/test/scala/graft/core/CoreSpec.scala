package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden cases transposed from the reference's table-driven tests
  * (geom/wkt_test.go, geom/wkb_test.go, geom/alg_relate_test.go,
  * geom/attr_test.go, geom/alg_convex_hull_test.go) — values
  * re-derived, not copied.
  */
class CoreSpec extends AnyFunSuite {

  private def g(wkt: String): Geom = Wkt.parse(wkt)

  // ------------------------------------------------------------- WKT

  test("wkt round trip") {
    val cases = Seq(
      "POINT(1 2)",
      "POINT EMPTY",
      "POINT Z (1 2 3)",
      "POINT M (1 2 4)",
      "POINT ZM (1 2 3 4)",
      "LINESTRING(0 0,1 1,2 0)",
      "LINESTRING EMPTY",
      "POLYGON((0 0,4 0,4 4,0 4,0 0))",
      "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
      "POLYGON EMPTY",
      "MULTIPOINT((1 2),(3 4))",
      "MULTIPOINT(EMPTY,(3 4))",
      "MULTIPOINT EMPTY",
      "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
      "MULTILINESTRING EMPTY",
      "MULTIPOLYGON(((0 0,1 0,0 1,0 0)),((5 5,6 5,5 6,5 5)))",
      "MULTIPOLYGON EMPTY",
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))",
      "GEOMETRYCOLLECTION EMPTY",
      "LINESTRING Z (0 0 1,1 1 2)",
      "POLYGON Z ((0 0 0,4 0 0,4 4 0,0 4 0,0 0 0))")
    for (w <- cases) {
      assert(Wkt.write(Wkt.parse(w)) == w, s"round trip of $w")
    }
  }

  test("wkt parenless multipoint (PostGIS extension)") {
    assert(Wkt.write(g("MULTIPOINT(1 2,3 4)")) == "MULTIPOINT((1 2),(3 4))")
  }

  test("wkt float formatting matches Go strconv 'f' shortest") {
    assert(Wkt.fmt(1.0) == "1")
    assert(Wkt.fmt(-1.5) == "-1.5")
    assert(Wkt.fmt(0.0) == "0")
    assert(Wkt.fmt(-0.0) == "0")
    assert(Wkt.fmt(0.1) == "0.1")
    assert(Wkt.fmt(1e7) == "10000000")
    assert(Wkt.fmt(1.25e-4) == "0.000125")
    assert(Wkt.fmt(123456.789) == "123456.789")
    assert(Wkt.fmt(1e21) == "1000000000000000000000")
    assert(Wkt.fmt(3.141592653589793) == "3.141592653589793")
  }

  test("wkt parse errors") {
    for (bad <- Seq("POINT(0 0) MORE", "POINT[0 0)", "NOPE(1 2)", "POINT(1)", ""))
      assertThrows[Wkt.ParseException](Wkt.parse(bad))
  }

  // ------------------------------------------------------------- WKB

  test("wkb round trip through bytes") {
    val cases = Seq(
      "POINT(1 2)", "POINT EMPTY", "POINT Z (1 2 3)", "POINT ZM (1 2 3 4)",
      "LINESTRING(0 0,1 1,2 0)", "LINESTRING EMPTY",
      "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
      "MULTIPOINT((1 2),EMPTY)", "MULTILINESTRING((0 0,1 1))",
      "MULTIPOLYGON(((0 0,1 0,0 1,0 0)))",
      "GEOMETRYCOLLECTION(POINT(1 2),GEOMETRYCOLLECTION(LINESTRING(0 0,1 1)))",
      "GEOMETRYCOLLECTION EMPTY")
    for (w <- cases) {
      val geo = g(w)
      val back = Wkb.read(Wkb.write(geo))
      assert(Wkt.write(back) == w, s"wkb round trip of $w")
    }
  }

  test("wkb big-endian parse") {
    // hand-built big-endian POINT(1 2)
    val buf = java.nio.ByteBuffer.allocate(21)
    buf.put(0.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    assert(Wkt.write(Wkb.read(buf.array())) == "POINT(1 2)")
  }

  test("wkb rejects garbage") {
    assertThrows[Wkb.ParseException](Wkb.read(Array[Byte](9, 9, 9)))
    assertThrows[Wkb.ParseException](Wkb.read(Array[Byte]()))
    // hostile count
    val buf = java.nio.ByteBuffer.allocate(9).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte).putInt(2).putInt(Int.MaxValue)
    assertThrows[Wkb.ParseException](Wkb.read(buf.array()))
  }

  // ----------------------------------------------------------- GeoJSON

  test("geojson round trip") {
    val cases = Seq(
      """{"type":"Point","coordinates":[1,2]}""",
      """{"type":"LineString","coordinates":[[0,0],[1,1]]}""",
      """{"type":"Polygon","coordinates":[[[0,0],[4,0],[4,4],[0,4],[0,0]]]}""",
      """{"type":"MultiPoint","coordinates":[[1,2],[3,4]]}""",
      """{"type":"GeometryCollection","geometries":[{"type":"Point","coordinates":[1,2]}]}""")
    for (j <- cases) assert(GeoJson.write(GeoJson.parse(j)) == j)
  }

  test("geojson XYZ inference") {
    val p = GeoJson.parse("""{"type":"Point","coordinates":[1,2,3]}""")
    assert(p.ct == CT.XYZ)
    assert(Wkt.write(p) == "POINT Z (1 2 3)")
  }

  // ------------------------------------------------------- predicates

  test("signed area: winding sign, holes cancel by winding (reference SignedArea)") {
    // CCW unit square -> +1; CW -> -1
    assert(Measure.signedArea(g("POLYGON((0 0,1 0,1 1,0 1,0 0))")) === 1.0)
    assert(Measure.signedArea(g("POLYGON((0 0,0 1,1 1,1 0,0 0))")) === -1.0)
    // CCW shell with CW hole: 9 - 1 = 8 (hole ring is summed signed)
    assert(Measure.signedArea(
      g("POLYGON((0 0,3 0,3 3,0 3,0 0),(1 1,1 2,2 2,2 1,1 1))")) === 8.0)
    // multipolygon sums; non-areal inputs contribute 0
    assert(Measure.signedArea(
      g("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,5 6,6 6,6 5,5 5)))")) === 0.0)
    assert(Measure.signedArea(g("LINESTRING(0 0,5 5)")) === 0.0)
    // abs-area unchanged by winding
    assert(Measure.area(g("POLYGON((0 0,0 1,1 1,1 0,0 0))")) === 1.0)
  }

  test("point in polygon ray casting") {
    val poly = g("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))").asInstanceOf[GPoly]
    assert(Alg.pointInPolygon(poly, 3, 3) == 1)    // interior
    assert(Alg.pointInPolygon(poly, 0, 0) == 0)    // shell vertex
    assert(Alg.pointInPolygon(poly, 2, 0) == 0)    // shell edge
    assert(Alg.pointInPolygon(poly, 1.5, 1.5) == -1) // in hole
    assert(Alg.pointInPolygon(poly, 1, 1.5) == 0)  // hole edge
    assert(Alg.pointInPolygon(poly, 5, 5) == -1)   // outside
    assert(Alg.pointInPolygon(poly, -1, 0) == -1)  // outside, on ray
  }

  test("relate point/polygon") {
    val a = g("POINT(2 2)")
    val b = g("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(Relate.relate(a, b) == "0FFFFF212")
    assert(Relate.within(a, b))
    assert(Relate.contains(b, a))
    assert(Relate.intersects(a, b))
    assert(!Relate.disjoint(a, b))
    val boundary = g("POINT(4 2)")
    assert(Relate.relate(boundary, b) == "F0FFFF212")
    assert(Relate.touches(boundary, b))
    val out = g("POINT(9 9)")
    assert(Relate.relate(out, b) == "FF0FFF212")
    assert(Relate.disjoint(out, b))
  }

  test("relate polygon/polygon") {
    val sq = "POLYGON((0 0,4 0,4 4,0 4,0 0))"
    // equal
    assert(Relate.relate(g(sq), g(sq)) == "2FFF1FFF2")
    assert(Relate.equalsTopo(g(sq), g(sq)))
    // contained (strict)
    val inner = g("POLYGON((1 1,2 1,2 2,1 2,1 1))")
    assert(Relate.relate(inner, g(sq)) == "2FF1FF212")
    assert(Relate.within(inner, g(sq)))
    assert(Relate.contains(g(sq), inner))
    // overlapping
    val shifted = g("POLYGON((2 2,6 2,6 6,2 6,2 2))")
    assert(Relate.relate(g(sq), shifted) == "212101212")
    assert(Relate.overlaps(g(sq), shifted))
    // touching along an edge
    val adjacent = g("POLYGON((4 0,8 0,8 4,4 4,4 0))")
    assert(Relate.relate(g(sq), adjacent) == "FF2F11212")
    assert(Relate.touches(g(sq), adjacent))
    // touching at a corner
    val corner = g("POLYGON((4 4,8 4,8 8,4 8,4 4))")
    assert(Relate.relate(g(sq), corner) == "FF2F01212")
    assert(Relate.touches(g(sq), corner))
    // disjoint
    val far = g("POLYGON((9 9,10 9,10 10,9 10,9 9))")
    assert(Relate.relate(g(sq), far) == "FF2FF1212")
    // contained touching border from inside
    val edgeInner = g("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    assert(Relate.covers(g(sq), edgeInner))
    assert(Relate.coveredBy(edgeInner, g(sq)))
    assert(Relate.contains(g(sq), edgeInner)) // interior contact exists
  }

  test("containsProperly (T**FF*FF*)") {
    val sq = g("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    // strictly inside: contains AND containsProperly
    val inner = g("POLYGON((1 1,2 1,2 2,1 2,1 1))")
    assert(Relate.contains(sq, inner))
    assert(Relate.containsProperly(sq, inner))
    // touching the container boundary from inside: contains but NOT properly
    val edgeInner = g("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    assert(Relate.contains(sq, edgeInner))
    assert(!Relate.containsProperly(sq, edgeInner))
    // a line along the boundary with an interior excursion: contained, not properly
    val edgeLine = g("LINESTRING(0 0,0 2)")
    assert(Relate.covers(sq, edgeLine))
    assert(!Relate.containsProperly(sq, edgeLine))
    val interiorLine = g("LINESTRING(1 1,3 3)")
    assert(Relate.containsProperly(sq, interiorLine))
    // point fast path: interior yes, boundary no, exterior no
    assert(Relate.containsProperly(sq, g("POINT(2 2)")))
    assert(!Relate.containsProperly(sq, g("POINT(4 2)")))
    assert(!Relate.containsProperly(sq, g("POINT(9 9)")))
    // multipoint: all interior yes; one on boundary kills it
    assert(Relate.containsProperly(sq, g("MULTIPOINT(1 1,2 2)")))
    assert(!Relate.containsProperly(sq, g("MULTIPOINT(1 1,4 2)")))
    // identical polygons share the whole boundary: never properly
    assert(!Relate.containsProperly(sq, sq))
    // empties
    assert(!Relate.containsProperly(sq, g("POLYGON EMPTY")))
  }

  test("relate with hole") {
    val donut = g("POLYGON((0 0,10 0,10 10,0 10,0 0),(3 3,7 3,7 7,3 7,3 3))")
    val inHole = g("POLYGON((4 4,6 4,6 6,4 6,4 4))")
    val m = Relate.relate(inHole, donut)
    assert(m.charAt(Relate.II) == 'F')
    assert(Relate.disjoint(inHole, donut))
    val spanning = g("POLYGON((2 2,8 2,8 8,2 8,2 2))") // covers the hole ring
    assert(!Relate.contains(donut, spanning))
    assert(Relate.intersects(donut, spanning))
  }

  test("relate line/line") {
    val a = g("LINESTRING(0 0,4 4)")
    val cross = g("LINESTRING(0 4,4 0)")
    assert(Relate.relate(a, cross) == "0F1FF0102")
    assert(Relate.crosses(a, cross))
    val same = g("LINESTRING(0 0,4 4)")
    assert(Relate.equalsTopo(a, same))
    val touch = g("LINESTRING(4 4,8 0)") // endpoint to endpoint
    assert(Relate.touches(a, touch))
    val overlap = g("LINESTRING(2 2,6 6)")
    assert(Relate.overlaps(a, overlap))
    assert(Relate.relate(a, overlap).charAt(Relate.II) == '1')
    val sub = g("LINESTRING(1 1,2 2)")
    assert(Relate.contains(a, sub))
    assert(Relate.within(sub, a))
  }

  test("relate line/polygon") {
    val poly = g("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    val through = g("LINESTRING(-1 2,5 2)")
    val m = Relate.relate(through, poly)
    assert(m.charAt(Relate.II) == '1')
    assert(m.charAt(Relate.IE) == '1')
    assert(Relate.crosses(through, poly))
    val inside = g("LINESTRING(1 1,3 3)")
    assert(Relate.within(inside, poly))
    assert(Relate.contains(poly, inside))
    val onEdge = g("LINESTRING(1 0,3 0)")
    assert(Relate.touches(onEdge, poly))
    val outside = g("LINESTRING(5 5,9 9)")
    assert(Relate.disjoint(outside, poly))
  }

  test("relate empty inputs") {
    assert(Relate.relate(g("POINT EMPTY"), g("POINT(1 1)")) == "FFFFFF0F2")
    assert(Relate.relate(g("POINT(1 1)"), g("POLYGON EMPTY")) == "FF0FFFFF2")
    assert(Relate.relate(g("POINT EMPTY"), g("POINT EMPTY")) == "FFFFFFFF2")
    assert(Relate.equalsTopo(g("POINT EMPTY"), g("LINESTRING EMPTY")))
  }

  test("de9im pattern matching") {
    assert(Relate.matches("0FFFFF212", "T*F**F***"))
    assert(!Relate.matches("FF0FFF212", "T********"))
    assertThrows[IllegalArgumentException](Relate.matches("0F", "T*"))
  }

  // ----------------------------------------------------- measurements

  test("area with holes") {
    assert(Measure.area(g("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == 16.0)
    assert(Measure.area(g("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")) == 15.0)
    assert(Measure.area(g("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,7 5,7 7,5 7,5 5)))")) == 5.0)
    assert(Measure.area(g("LINESTRING(0 0,1 1)")) == 0.0)
    assert(Measure.area(g("POLYGON EMPTY")) == 0.0)
  }

  test("length") {
    assert(Measure.length(g("LINESTRING(0 0,3 4)")) == 5.0)
    assert(Measure.length(g("MULTILINESTRING((0 0,3 4),(0 0,0 2))")) == 7.0)
    assert(Measure.length(g("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == 0.0)
  }

  test("centroid") {
    assert(Measure.centroid(g("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == Some((2.0, 2.0)))
    assert(Measure.centroid(g("LINESTRING(0 0,0 4)")) == Some((0.0, 2.0)))
    assert(Measure.centroid(g("MULTIPOINT((0 0),(2 0),(1 3))")) == Some((1.0, 1.0)))
    assert(Measure.centroid(g("POINT EMPTY")) == None)
    // areal dominates linear in collections
    val mixed = g("GEOMETRYCOLLECTION(POLYGON((0 0,2 0,2 2,0 2,0 0)),LINESTRING(50 50,60 60))")
    assert(Measure.centroid(mixed) == Some((1.0, 1.0)))
  }

  test("distance") {
    assert(Intersects.distance(g("POINT(0 0)"), g("POINT(3 4)")) == Some(5.0))
    assert(Intersects.distance(g("POINT(0 0)"), g("LINESTRING(0 5,10 5)")) == Some(5.0))
    assert(Intersects.distance(
      g("POLYGON((0 0,1 0,1 1,0 1,0 0))"), g("POLYGON((3 0,4 0,4 1,3 1,3 0))")) == Some(2.0))
    assert(Intersects.distance(g("POINT(2 2)"), g("POLYGON((0 0,4 0,4 4,0 4,0 0))")) == Some(0.0))
    assert(Intersects.distance(g("POINT EMPTY"), g("POINT(1 1)")) == None)
  }

  // ----------------------------------------------------------- algos

  test("convex hull") {
    val hull = Algos.convexHull(g("MULTIPOINT((0 0),(4 0),(4 4),(0 4),(2 2),(1 1))"))
    assert(Measure.area(hull) == 16.0)
    assert(Algos.convexHull(g("POINT(1 2)")).isInstanceOf[GPoint])
    assert(Wkt.write(Algos.convexHull(g("MULTIPOINT((0 0),(1 1),(2 2))"))) == "LINESTRING(0 0,2 2)")
    assert(Algos.convexHull(g("GEOMETRYCOLLECTION EMPTY")).isEmpty)
  }

  test("simplify") {
    val line = g("LINESTRING(0 0,1 0.1,2 0,3 0.1,4 0)")
    assert(Wkt.write(Algos.simplify(line, 0.5)) == "LINESTRING(0 0,4 0)")
    assert(Wkt.write(Algos.simplify(line, 0.01)) == "LINESTRING(0 0,1 0.1,2 0,3 0.1,4 0)")
  }

  test("densify") {
    val out = Algos.densify(g("LINESTRING(0 0,10 0)"), 3.0)
    assert(Wkt.write(out) == "LINESTRING(0 0,2.5 0,5 0,7.5 0,10 0)")
  }

  test("clip polygon to box (Sutherland-Hodgman)") {
    val poly = g("POLYGON((0 0,4 0,4 4,0 4,0 0))")
    val clipped = Algos.clipToBox(poly, Env(2, 2, 6, 6))
    assert(Measure.area(clipped) == 4.0)
    val missed = Algos.clipToBox(poly, Env(10, 10, 12, 12))
    assert(missed.isEmpty)
    val all = Algos.clipToBox(poly, Env(-1, -1, 5, 5))
    assert(Measure.area(all) == 16.0)
  }

  test("clip line to box (Liang-Barsky)") {
    val line = g("LINESTRING(-2 2,8 2)")
    val out = Algos.clipToBox(line, Env(0, 0, 4, 4))
    assert(Wkt.write(out) == "LINESTRING(0 2,4 2)")
    val zig = g("LINESTRING(-1 1,1 1,1 5,3 5,3 1,5 1)")
    val parts = Algos.clipToBox(zig, Env(0, 0, 4, 4))
    assert(parts.isInstanceOf[GMLine])
  }

  test("interpolate point") {
    val s = g("LINESTRING(0 0,10 0)").asInstanceOf[GLine].seq
    assert(Algos.interpolatePoint(s, 0.25) == Some((2.5, 0.0)))
    assert(Algos.interpolatePoint(s, -1) == Some((0.0, 0.0)))
    assert(Algos.interpolatePoint(s, 2) == Some((10.0, 0.0)))
  }

  test("force orientation") {
    val cw = g("POLYGON((0 0,0 4,4 4,4 0,0 0))") // clockwise shell
    val ccw = Algos.forceOrientation(cw, shellCW = false).asInstanceOf[GPoly]
    assert(Alg.signedRingArea(ccw.rings(0)) > 0)
  }

  // ------------------------------------------------------- validation

  test("validation rules") {
    assert(Validate.isValid(g("POINT(1 2)")))
    assert(Validate.isValid(g("POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))")))
    // bowtie: self-intersecting ring
    assert(!Validate.isValid(g("POLYGON((0 0,4 4,4 0,0 4,0 0))")))
    // hole outside shell
    assert(!Validate.isValid(g("POLYGON((0 0,2 0,2 2,0 2,0 0),(5 5,6 5,6 6,5 6,5 5))")))
    // repeated single point linestring
    assert(!Validate.isValid(g("LINESTRING(1 1,1 1)")))
    // unclosed ring
    assert(Validate.reason(g("POLYGON((0 0,4 0,4 4,0 4))")).exists(_.contains("closed")))
    // overlapping multipolygon children
    assert(!Validate.isValid(g("MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((2 2,6 2,6 6,2 6,2 2)))")))
    // valid multipolygon touching at a point
    assert(Validate.isValid(g("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((1 1,2 1,2 2,1 2,1 1)))")))
    // NaN coordinates
    assert(Validate.reason(GPoint(Array(Double.NaN, 1.0), CT.XY)).isDefined)
  }

  // ----------------------------------------------------------- rtree

  test("rtree range and priority search") {
    val envs = (0 until 1000).map { i =>
      val x = (i % 100).toDouble; val y = (i / 100).toDouble
      Env(x, y, x + 0.5, y + 0.5)
    }.toArray
    val t = RTree.bulkLoad(envs)
    assert(t.count == 1000)
    var hits = List.empty[Int]
    t.rangeSearch(Env(10, 2, 12, 3)) { i => hits ::= i; true }
    val brute = envs.indices.filter(i => envs(i).intersects(Env(10, 2, 12, 3)))
    assert(hits.toSet == brute.toSet)
    // nearest: priority search yields non-decreasing distances
    var last = -1.0
    var n = 0
    t.prioritySearch(Env.ofPt(50.2, 5.2)) { (_, d) =>
      assert(d >= last); last = d; n += 1; n < 20
    }
    assert(n == 20)
    // early-exit stop works
    var cnt = 0
    t.rangeSearch(Env(-1, -1, 1000, 1000)) { _ => cnt += 1; cnt < 5 }
    assert(cnt == 5)
  }

  // ------------------------------------------------------ geom basics

  test("accessors and transforms") {
    assert(g("POINT(1 2)").dimension == 0)
    assert(g("LINESTRING(0 0,1 1)").dimension == 1)
    assert(g("POLYGON((0 0,1 0,1 1,0 0))").dimension == 2)
    assert(g("GEOMETRYCOLLECTION EMPTY").dimension == -1)
    assert(g("GEOMETRYCOLLECTION(POINT(1 1),POLYGON((0 0,1 0,1 1,0 0)))").dimension == 2)
    assert(Geom.numGeometries(g("MULTIPOINT((1 2),(3 4))")) == 2)
    assert(Wkt.write(Geom.flip(g("LINESTRING(1 2,3 4)"))) == "LINESTRING(2 1,4 3)")
    assert(Wkt.write(Geom.reverse(g("LINESTRING(0 0,1 1,2 2)"))) == "LINESTRING(2 2,1 1,0 0)")
    assert(Wkt.write(Geom.force2D(g("POINT Z (1 2 3)"))) == "POINT(1 2)")
    assert(Wkt.write(Geom.snapToGrid(g("POINT(1.2345 2.3456)"), 2)) == "POINT(1.23 2.35)")
    val e = g("POLYGON((0 0,4 0,4 4,0 4,0 0))").envelope
    assert(e == Env(0, 0, 4, 4))
    assert(Wkt.write(e.toGeom) == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    val dumped = Geom.dump(g("MULTIPOLYGON(((0 0,1 0,0 1,0 0)),((5 5,6 5,5 6,5 5)))"))
    assert(dumped.length == 2)
  }

  test("robust orientation near-degenerate") {
    // a classic case where plain doubles misjudge
    val ax = 0.1; val ay = 0.1
    val bx = 0.1 + 1e-16; val by = 0.1 + 1e-16
    // orientation of three almost-collinear points is deterministic & exact
    val o1 = Alg.orient(ax, ay, bx, by, 0.2, 0.2)
    val o2 = Alg.orient(bx, by, ax, ay, 0.2, 0.2)
    assert(o1 == -o2 || (o1 == 0 && o2 == 0))
  }
}

class TwkbSpec extends org.scalatest.funsuite.AnyFunSuite {
  private def g(w: String): Geom = Wkt.parse(w)

  test("twkb round trip at precision 0") {
    val cases = Seq(
      "POINT(1 2)", "POINT EMPTY",
      "LINESTRING(0 0,100 100,200 0)",
      "POLYGON((0 0,40 0,40 40,0 40,0 0))",
      "POLYGON((0 0,40 0,40 40,0 40,0 0),(10 10,20 10,20 20,10 20,10 10))",
      "MULTIPOINT((1 2),(3 4))",
      "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
      "MULTIPOLYGON(((0 0,10 0,0 10,0 0)),((50 50,60 50,50 60,50 50)))",
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,5 5))",
      "GEOMETRYCOLLECTION EMPTY", "MULTIPOLYGON EMPTY")
    for (w <- cases) {
      val back = Twkb.read(Twkb.write(g(w), 0))
      assert(Wkt.write(back) == w, s"twkb round trip of $w")
    }
  }

  test("twkb quantization at precision 1") {
    val p = Twkb.read(Twkb.write(g("POINT(1.26 2.34)"), 1)).asInstanceOf[GPoint]
    assert(p.x == 1.3 && p.y == 2.3)
  }

  test("twkb negative precision coarsens") {
    val p = Twkb.read(Twkb.write(g("POINT(1234 5678)"), -2)).asInstanceOf[GPoint]
    assert(p.x == 1200.0 && p.y == 5700.0)
  }

  test("twkb bbox header fast envelope") {
    val b = Twkb.write(g("POLYGON((0 0,40 0,40 40,0 40,0 0))"), 0, withBBox = true)
    assert(Twkb.readEnvelope(b) == Some(Env(0, 0, 40, 40)))
    // without bbox header -> None
    val nb = Twkb.write(g("POINT(1 2)"), 0)
    assert(Twkb.readEnvelope(nb) == None)
    // size header round trips too
    val sb = Twkb.write(g("LINESTRING(0 0,10 10)"), 0, withBBox = true, withSize = true)
    assert(Wkt.write(Twkb.read(sb)) == "LINESTRING(0 0,10 10)")
  }

  test("twkb id-list and size headers (write + partial read)") {
    val mp = g("MULTIPOINT(1 1,2 2,3 3)")
    val ids = Array(100L, -7L, 4200000000L)
    val b = Twkb.write(mp, 0, withBBox = true, withSize = true, ids = ids)
    // partial readers see the headers without decoding coordinates
    assert(Twkb.readIdList(b).map(_.toSeq) == Some(ids.toSeq))
    assert(Twkb.readSize(b) == Some(b.length.toLong))
    assert(Twkb.readEnvelope(b) == Some(Env(1, 1, 3, 3)))
    // the full decode still round-trips (ids skipped in geometry)
    assert(Wkt.write(Twkb.read(b)) == "MULTIPOINT((1 1),(2 2),(3 3))")
    // absent headers -> None
    val plain = Twkb.write(mp, 0)
    assert(Twkb.readIdList(plain).isEmpty && Twkb.readSize(plain).isEmpty)
    // size supports scanning a concatenation of TWKBs
    val b2 = Twkb.write(g("POINT(9 9)"), 0, withSize = true)
    val cat = b ++ b2
    val n1 = Twkb.readSize(cat).get.toInt
    assert(n1 == b.length)
    assert(Wkt.write(Twkb.read(cat.drop(n1))) == "POINT(9 9)")
    // multiline + collection carriers too
    val ml = g("MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    val mb = Twkb.write(ml, 0, ids = Array(5L, 6L))
    assert(Twkb.readIdList(mb).map(_.toSeq) == Some(Seq(5L, 6L)))
    assert(Wkt.write(Twkb.read(mb)) == "MULTILINESTRING((0 0,1 1),(2 2,3 3))")
    intercept[IllegalArgumentException] {
      Twkb.write(g("POINT(1 1)"), 0, ids = Array(1L))
    }
  }

  test("twkb is much smaller than wkb for polygons") {
    val poly = g("POLYGON((0 0,40 0,40 40,0 40,0 0),(10 10,20 10,20 20,10 20,10 10))")
    val wkb = Wkb.write(poly)
    val twkb = Twkb.write(poly, 0)
    assert(twkb.length * 3 < wkb.length, s"twkb=${twkb.length} wkb=${wkb.length}")
  }
}
