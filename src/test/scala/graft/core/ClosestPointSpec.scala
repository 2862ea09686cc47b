package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ClosestPointSpec extends AnyFunSuite {

  private def pt(x: Double, y: Double) = GPoint(Array(x, y), CT.XY)
  private def box(x0: Double, y0: Double, x1: Double, y1: Double) =
    GPoly(Array(Seqn.xy(Array(x0, y0, x1, y0, x1, y1, x0, y1, x0, y0))), CT.XY)
  private def line(cs: Double*) = GLine(Seqn.xy(cs.toArray))

  test("point to box: witness is the clamp, length is the distance") {
    val b = box(0, 0, 10, 5)
    for ((px, py) <- Seq((-3.0, -4.0), (15.0, 2.0), (4.0, 9.0), (12.0, 7.0), (-1.0, 2.5))) {
      val Some((ax, ay, bx, by)) = Intersects.closestPoints(pt(px, py), b)
      assert(ax == px && ay == py, "p must lie on the point side")
      val cx = math.min(math.max(px, 0.0), 10.0)
      val cy = math.min(math.max(py, 0.0), 5.0)
      assert(math.abs(bx - cx) < 1e-12 && math.abs(by - cy) < 1e-12,
        s"($px,$py): got ($bx,$by), want ($cx,$cy)")
      val d = Intersects.distance(pt(px, py), b).get
      assert(math.abs(math.hypot(px - bx, py - by) - d) < 1e-12)
    }
  }

  test("intersecting inputs collapse to one shared point") {
    val b = box(0, 0, 10, 5)
    val Some((ax, ay, bx, by)) = Intersects.closestPoints(pt(3, 2), b)
    assert(ax == 3 && ay == 2 && bx == 3 && by == 2)
  }

  test("segment-segment witness realizes the distance (random)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val l1 = line(rnd.nextInt(100), rnd.nextInt(100), rnd.nextInt(100), rnd.nextInt(100))
      val l2 = line(rnd.nextInt(100) + 200, rnd.nextInt(100), rnd.nextInt(100) + 200, rnd.nextInt(100))
      val Some((ax, ay, bx, by)) = Intersects.closestPoints(l1, l2)
      val d = Intersects.distance(l1, l2).get
      assert(math.abs(math.hypot(ax - bx, ay - by) - d) < 1e-9)
      // p on l1, q on l2 (within fp tolerance of the segment)
      assert(Alg.distPointSeg(ax, ay, l1.seq.x(0), l1.seq.y(0), l1.seq.x(1), l1.seq.y(1)) < 1e-9)
      assert(Alg.distPointSeg(bx, by, l2.seq.x(0), l2.seq.y(0), l2.seq.x(1), l2.seq.y(1)) < 1e-9)
    }
  }

  test("discrete hausdorff: multipoint max-min, symmetric") {
    val a = GMPoint(Array(pt(0, 0), pt(1, 0), pt(2, 0)), CT.XY)
    val b = GMPoint(Array(pt(0, 3), pt(2, 4)), CT.XY)
    // directed a->b: (0,0)->3, (1,0)->min(sqrt(10),sqrt(17))=sqrt(10), (2,0)->4 => 4
    // directed b->a: (0,3)->3, (2,4)->4 => 4
    assert(math.abs(Intersects.hausdorff(a, b).get - 4.0) < 1e-12)
    assert(Intersects.hausdorff(a, b) == Intersects.hausdorff(b, a))
    assert(Intersects.hausdorff(a, GPoint(Array.emptyDoubleArray, CT.XY)).isEmpty)
    // identical sets -> 0
    assert(Intersects.hausdorff(a, a).get == 0.0)
  }

  test("hausdorff vertex-to-geometry: uses exact segment distance") {
    // vertices of a sit on b's segment interior -> directed a->b is 0,
    // but b's endpoints are 5 away from a's nearest vertex
    val a = GMPoint(Array(pt(5, 0)), CT.XY)
    val b = line(0, 0, 10, 0)
    assert(math.abs(Intersects.hausdorff(a, b).get - 5.0) < 1e-12)
  }
}
