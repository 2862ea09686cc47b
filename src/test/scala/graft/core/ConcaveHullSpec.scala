package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ConcaveHullSpec extends AnyFunSuite {

  private def mp(pts: Seq[(Double, Double)]): Geom =
    GMPoint(pts.map { case (x, y) => GPoint(Array(x, y), CT.XY) }.toArray, CT.XY)

  private def covers(hull: Geom, pts: Seq[(Double, Double)]): Boolean =
    pts.forall { case (x, y) => Alg.pointInAreal(hull, x, y) >= 0 }

  test("ratio 1 equals the convex hull (area identity, all points covered)") {
    for (seed <- 1 to 15) {
      val rnd = new scala.util.Random(seed)
      val pts = Seq.fill(5 + rnd.nextInt(80))(
        (rnd.nextInt(30).toDouble, rnd.nextInt(30).toDouble)).distinct
      val g = mp(pts)
      val hull = ConcaveHull.hull(g, 1.0, allowHoles = false)
      val convex = Algos.convexHull(g)
      if (convex.dimension == 2) {
        assert(Validate.isValid(hull), s"seed=$seed: ${Wkt.write(hull)}")
        assert(math.abs(Measure.area(hull) - Measure.area(convex)) <= 1e-9,
          s"seed=$seed: ${Measure.area(hull)} vs ${Measure.area(convex)}")
        assert(covers(hull, pts), s"seed=$seed: hull does not cover inputs")
      }
    }
  }

  test("C-shape: low ratio carves the mouth, high ratio keeps it") {
    // unit-grid C: a 7x7 block minus a 3x5 mouth notch opening right
    val pts = for {
      x <- 0 to 6; y <- 0 to 6
      if !(x >= 2 && y >= 2 && y <= 4) // notch x>=2, 2<=y<=4
    } yield (x.toDouble, y.toDouble)
    val g = mp(pts)
    val lo = ConcaveHull.hull(g, 0.0, allowHoles = false)
    val hi = ConcaveHull.hull(g, 1.0, allowHoles = false)
    assert(Validate.isValid(lo) && Validate.isValid(hi))
    assert(covers(lo, pts) && covers(hi, pts))
    // the deep-mouth probe is inside the convex hull, outside the concave
    assert(Alg.pointInAreal(hi, 5.0, 3.0) > 0, Wkt.write(hi))
    assert(Alg.pointInAreal(lo, 5.0, 3.0) < 0, Wkt.write(lo))
    assert(Measure.area(lo) < Measure.area(hi))
    assert(math.abs(Measure.area(hi) - 36.0) <= 1e-9) // convex hull 6x6
  }

  test("hull is valid, covers inputs, and area grows with ratio (random sweeps)") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(500 + seed)
      val pts = Seq.fill(30 + rnd.nextInt(120))(
        (rnd.nextDouble() * 40, rnd.nextDouble() * 40)).distinct
      val g = mp(pts)
      val areas = Seq(0.0, 0.3, 0.7, 1.0).map { r =>
        val h = ConcaveHull.hull(g, r, allowHoles = false)
        assert(h.isEmpty || Validate.isValid(h),
          s"seed=$seed ratio=$r invalid: ${Wkt.write(h).take(200)}")
        assert(covers(h, pts), s"seed=$seed ratio=$r does not cover inputs")
        Measure.area(h)
      }
      val convexArea = Measure.area(Algos.convexHull(g))
      for (a <- areas) assert(a <= convexArea + 1e-9, s"seed=$seed areas=$areas")
      assert(math.abs(areas.last - convexArea) <= 1e-9, s"seed=$seed")
    }
  }

  test("allowHoles carves interior holes on an annulus; disallowed keeps none") {
    // dense unit-grid annulus: 13x13 block minus the 5x5 center
    val pts = for {
      x <- 0 to 12; y <- 0 to 12
      if math.max(math.abs(x - 6), math.abs(y - 6)) >= 3
    } yield (x.toDouble, y.toDouble)
    val g = mp(pts)
    val noHoles = ConcaveHull.hull(g, 0.0, allowHoles = false)
    val withHoles = ConcaveHull.hull(g, 0.0, allowHoles = true)
    assert(Validate.isValid(noHoles) && Validate.isValid(withHoles))
    assert(covers(noHoles, pts) && covers(withHoles, pts))
    def nHoles(h: Geom): Int = h match {
      case GPoly(rs, _) => rs.length - 1
      case GMPoly(ps, _) => ps.map(_.length - 1).sum
      case _ => 0
    }
    assert(nHoles(noHoles) == 0, Wkt.write(noHoles))
    assert(nHoles(withHoles) >= 1, Wkt.write(withHoles))
    assert(Measure.area(withHoles) < Measure.area(noHoles))
    // the hole actually excludes the annulus center
    assert(Alg.pointInAreal(withHoles, 6.0, 6.0) < 0)
  }

  test("degenerate inputs follow the reference contract (point / line)") {
    assert(Wkt.write(ConcaveHull.hull(Wkt.parse("POINT(3 4)"), 0.5, false)) == "POINT(3 4)")
    val line = ConcaveHull.hull(Wkt.parse("MULTIPOINT(0 0,1 1,2 2,3 3)"), 0.5, false)
    assert(line.isInstanceOf[GLine], Wkt.write(line))
    val empty = ConcaveHull.hull(Wkt.parse("POLYGON EMPTY"), 0.5, false)
    assert(empty.isEmpty)
  }

  test("hull vertices are a subset of the input vertices (reference contract)") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(60)((rnd.nextInt(20).toDouble, rnd.nextInt(20).toDouble)).distinct
    val hull = ConcaveHull.hull(mp(pts), 0.2, allowHoles = false)
    val inSet = pts.toSet
    def ringsOf(g: Geom): Seq[Seqn] = g match {
      case GPoly(rs, _) => rs.toSeq
      case GMPoly(ps, _) => ps.toSeq.flatten
      case _ => Seq.empty
    }
    for (r <- ringsOf(hull); i <- 0 until r.n)
      assert(inSet.contains((r.x(i), r.y(i))), s"foreign vertex ${r.x(i)},${r.y(i)}")
  }
}
