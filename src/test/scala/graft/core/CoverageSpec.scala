package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Coverage.union / Coverage.isValid — GEOS wrapper analogues
  * (reference geos/entrypoints.go:281-317).
  */
class CoverageSpec extends AnyFunSuite {

  private def box(x0: Double, y0: Double, x1: Double, y1: Double): Geom =
    Wkt.parse(s"POLYGON(($x0 $y0,$x1 $y0,$x1 $y1,$x0 $y1,$x0 $y0))")

  private def gc(gs: Geom*): Geom = GColl(gs.toArray, CT.XY)

  test("unit-tile grid unions to the bounding box, T-join vertices kept") {
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 5), (8, 3))) {
      val tiles = for (i <- 0 until w; j <- 0 until h)
        yield box(i, j, i + 1, j + 1)
      val u = Coverage.union(gc(tiles: _*))
      assert(Validate.isValid(u), Wkt.write(u))
      assert(math.abs(Measure.area(u) - w * h) < 1e-12)
      // all 2(w+h) grid-boundary vertices survive (no collinear removal)
      val ring = u.asInstanceOf[GPoly].rings(0)
      assert(ring.n == 2 * (w + h) + 1, s"${w}x$h: ring.n=${ring.n}")
    }
  }

  test("reference UnaryUnion shape: two overlapping squares as a 3-tile coverage") {
    // the reference's unary-union example re-expressed as a coverage:
    // [0,2]^2 and [1,3]^2 overlap on [1,2]^2 — tile the union instead.
    // The square must carry the split points (2,1) and (1,2): a
    // coverage's shared boundaries are vertex-exact on both sides.
    val u = Coverage.union(gc(
      Wkt.parse("POLYGON((0 0,2 0,2 1,2 2,1 2,0 2,0 0))"),
      Wkt.parse("POLYGON((2 1,3 1,3 3,1 3,1 2,2 2,2 1))")))
    assert(Validate.isValid(u), Wkt.write(u))
    assert(math.abs(Measure.area(u) - 7.0) < 1e-12) // 4 + 4 - 1 overlap
    assert(u.isInstanceOf[GPoly])
  }

  test("interior hole: ring of 8 tiles around an empty center") {
    val tiles = for {
      i <- 0 until 3; j <- 0 until 3
      if !(i == 1 && j == 1)
    } yield box(i, j, i + 1, j + 1)
    val u = Coverage.union(gc(tiles: _*))
    assert(Validate.isValid(u), Wkt.write(u))
    assert(math.abs(Measure.area(u) - 8.0) < 1e-12)
    val p = u.asInstanceOf[GPoly]
    assert(p.rings.length == 2, Wkt.write(u)) // shell + hole
    assert(Alg.pointInAreal(u, 1.5, 1.5) < 0)
  }

  test("disjoint components come out as a MultiPolygon") {
    val u = Coverage.union(gc(box(0, 0, 1, 1), box(5, 5, 6, 6)))
    assert(Validate.isValid(u))
    assert(Geom.numGeometries(u) == 2, Wkt.write(u))
    assert(math.abs(Measure.area(u) - 2.0) < 1e-12)
  }

  test("corner-touching tiles (4-corner vertex) produce a valid union") {
    // checkerboard: (0,0) and (1,1) tiles only — touch at one point
    val u = Coverage.union(gc(box(0, 0, 1, 1), box(1, 1, 2, 2)))
    assert(Validate.isValid(u), Wkt.write(u))
    assert(math.abs(Measure.area(u) - 2.0) < 1e-12)
    assert(Geom.numGeometries(u) == 2, Wkt.write(u))
  }

  test("overlapping elements are rejected (duplicated directed edge)") {
    intercept[IllegalArgumentException] {
      Coverage.union(gc(box(0, 0, 1, 1), box(0, 0, 1, 1)))
    }
  }

  test("multipolygon elements and nested collections flatten") {
    val mp = Wkt.parse(
      "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((1 0,2 0,2 1,1 1,1 0)))")
    val u = Coverage.union(gc(mp, box(0, 1, 2, 2)))
    assert(Validate.isValid(u))
    assert(math.abs(Measure.area(u) - 4.0) < 1e-12)
  }

  test("coverageIsValid: grid true; overlap false with invalid edges; bad noding false") {
    val grid = for (i <- 0 until 3; j <- 0 until 3) yield box(i, j, i + 1, j + 1)
    val (ok1, bad1) = Coverage.isValid(gc(grid: _*))
    assert(ok1 && bad1.isEmpty)

    val (ok2, bad2) = Coverage.isValid(gc(box(0, 0, 2, 2), box(1, 1, 3, 3)))
    assert(!ok2 && !bad2.isEmpty, Wkt.write(bad2))

    // same physical boundary, split differently on the two sides:
    // left tile's right edge is one segment; right tile's left edge is
    // two segments through (1, 0.5) — property 3 violated
    val right = Wkt.parse("POLYGON((1 0,2 0,2 1,1 1,1 0.5,1 0))")
    val (ok3, bad3) = Coverage.isValid(gc(box(0, 0, 1, 1), right))
    assert(!ok3 && !bad3.isEmpty, Wkt.write(bad3))

    // non-polygonal element
    val (ok4, _) = Coverage.isValid(gc(box(0, 0, 1, 1), Wkt.parse("POINT(9 9)")))
    assert(!ok4)
  }

  test("union is associative: partial unions merge to the same result") {
    val tiles = (for (i <- 0 until 4; j <- 0 until 3) yield box(i, j, i + 1, j + 1)).toSeq
    val whole = Coverage.union(gc(tiles: _*))
    val (l, r) = tiles.splitAt(5)
    val merged = Coverage.union(gc(Coverage.union(gc(l: _*)), Coverage.union(gc(r: _*))))
    assert(Wkt.write(SetOps.makeValid(merged)) === Wkt.write(SetOps.makeValid(whole)) ||
      math.abs(Measure.area(merged) - Measure.area(whole)) < 1e-12)
    assert(Validate.isValid(merged))
    assert(math.abs(Measure.area(merged) - 12.0) < 1e-12)
    val ring = merged.asInstanceOf[GPoly].rings(0)
    assert(ring.n == 2 * (4 + 3) + 1, s"ring.n=${ring.n}") // vertices preserved
  }

  test("simplifyVW: shared zigzag boundary simplifies identically on both sides") {
    // two tiles sharing a noisy vertical boundary: x = 1 with small
    // zigzag offsets (amplitude 0.05) that VW at tolerance 0.5 removes
    val zig = (1 to 9).map(j => (1.0 + (if (j % 2 == 0) 0.05 else -0.05), j / 10.0 * 10))
    val upWkt = ((0.0, 0.0) +: (1.0, 0.0) +: zig :+ (1.0, 10.0) :+ (0.0, 10.0) :+ (0.0, 0.0))
      .map { case (x, y) => s"$x $y" }.mkString(",")
    val left = Wkt.parse(s"POLYGON(($upWkt))")
    val right = Wkt.parse("POLYGON((" +
      (((1.0, 0.0) +: (2.0, 0.0) +: (2.0, 10.0) +: (1.0, 10.0) +: zig.reverse) :+ (1.0, 0.0))
        .map { case (x, y) => s"$x $y" }.mkString(",") + "))")
    val cov = GColl(Array(left, right), CT.XY)
    val (okIn, _) = Coverage.isValid(cov)
    assert(okIn, "fixture must be a valid coverage")
    val simp = Coverage.simplifyVW(cov, 0.5)
    val els = simp.asInstanceOf[GColl].geoms
    assert(els.length == 2)
    assert(els.forall(Validate.isValid), Wkt.write(simp))
    assert(Coverage.isValid(simp)._1, "simplified result must stay a valid coverage")
    // the zigzag is gone: each element lost vertices
    assert(els(0).numPoints < left.numPoints)
    assert(els(1).numPoints < right.numPoints)
    // total area conserved (shared-boundary moves cancel between the two sides)
    val a0 = Measure.area(left) + Measure.area(right)
    val a1 = els.map(Measure.area).sum
    assert(math.abs(a0 - a1) < 1e-9, s"$a0 vs $a1")
    // coverage union unchanged in outline area (outer boundary was straight)
    assert(math.abs(Measure.area(Coverage.union(simp)) - 20.0) < 1e-9)
  }

  test("simplifyVW preserveBoundary: outer boundary untouched, shared still simplifies") {
    val zig = (1 to 9).map(j => (1.0 + (if (j % 2 == 0) 0.05 else -0.05), j.toDouble))
    def ringWkt(pts: Seq[(Double, Double)]): String =
      pts.map { case (x, y) => s"$x $y" }.mkString(",")
    // outer boundary of the LEFT tile is also noisy (on x = 0)
    val outerZig = (1 to 9).map(j => (0.0 - (if (j % 2 == 0) 0.05 else -0.05), j.toDouble))
    val left = Wkt.parse("POLYGON((" + ringWkt(
      ((0.0, 0.0) +: (1.0, 0.0) +: zig) ++ Seq((1.0, 10.0), (0.0, 10.0)) ++ outerZig.reverse :+ (0.0, 0.0)) + "))")
    val right = Wkt.parse("POLYGON((" + ringWkt(
      ((1.0, 0.0) +: (2.0, 0.0) +: (2.0, 10.0) +: (1.0, 10.0) +: zig.reverse) :+ (1.0, 0.0)) + "))")
    val cov = GColl(Array(left, right), CT.XY)
    assert(Coverage.isValid(cov)._1)
    val simp = Coverage.simplifyVW(cov, 0.5, preserveBoundary = true)
    val els = simp.asInstanceOf[GColl].geoms
    assert(els.forall(Validate.isValid))
    assert(Coverage.isValid(simp)._1)
    // shared boundary simplified: right tile lost its zigzag vertices
    assert(els(1).numPoints < right.numPoints)
    // outer zigzag kept: count left's vertices near x=0
    def nearOuter(g: Geom): Int = {
      val r = g.asInstanceOf[GPoly].rings(0)
      (0 until r.n - 1).count(i => r.x(i) < 0.5) // exclude the closing dup
    }
    assert(nearOuter(els(0)) == nearOuter(left), Wkt.write(els(0)))
  }

  test("simplifyVW: tolerance 0 is identity; valid coverage out on a tile grid") {
    val tiles = for (i <- 0 until 3; j <- 0 until 2) yield box(i, j, i + 1, j + 1)
    val cov = gc(tiles: _*)
    val same = Coverage.simplifyVW(cov, 0.0)
    assert(Wkt.write(same) == Wkt.write(cov))
    // unit tiles have nothing below tolerance 0.1^2 to remove
    val simp = Coverage.simplifyVW(cov, 0.1)
    assert(Coverage.isValid(simp)._1)
    assert(math.abs(simp.asInstanceOf[GColl].geoms.map(Measure.area).sum - 6.0) < 1e-9)
  }
}
