package graft.core

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Brute-force validation of the incremental Delaunay builder: for
  * every triangulation produced we check, exhaustively, the empty
  * circumcircle property, CCW orientation, Euler count, edge-sharing
  * consistency, and that the triangle union is exactly the convex
  * hull (area identity).
  */
class DelaunaySpec extends AnyFunSuite {

  private def validate(xs: Array[Double], ys: Array[Double], label: String): Unit = {
    val res = Delaunay.triangulate(xs, ys)
    // distinct points
    val dist = (xs, ys).zipped.toSet.toArray
    if (dist.length < 3 ||
        dist.forall(p => Alg.orient(dist(0)._1, dist(0)._2, dist(1)._1, dist(1)._2, p._1, p._2) == 0)) {
      assert(res.isEmpty, s"$label: expected None for degenerate input")
      return
    }
    val tr = res.get
    val n = tr.xs.length
    val t = tr.tri
    val nT = tr.nTriangles
    // 1. all CCW, nonzero area
    for (i <- 0 until nT) {
      val (a, b, c) = (t(3 * i), t(3 * i + 1), t(3 * i + 2))
      assert(Alg.orient(tr.xs(a), tr.ys(a), tr.xs(b), tr.ys(b), tr.xs(c), tr.ys(c)) > 0,
        s"$label: triangle $i not CCW")
    }
    // 2. empty circumcircle (strict) — brute force
    for (i <- 0 until nT) {
      val (a, b, c) = (t(3 * i), t(3 * i + 1), t(3 * i + 2))
      var p = 0
      while (p < n) {
        if (p != a && p != b && p != c) {
          assert(Delaunay.inCircle(tr.xs(a), tr.ys(a), tr.xs(b), tr.ys(b),
            tr.xs(c), tr.ys(c), tr.xs(p), tr.ys(p)) <= 0,
            s"$label: point $p strictly inside circumcircle of triangle $i")
        }
        p += 1
      }
    }
    // 3. edge sharing: interior edges exactly twice, never more
    val edgeCount = mutable.HashMap.empty[(Int, Int), Int]
    for (i <- 0 until nT; e <- 0 until 3) {
      val u = t(3 * i + e); val w = t(3 * i + (e + 1) % 3)
      val key = (math.min(u, w), math.max(u, w))
      edgeCount(key) = edgeCount.getOrElse(key, 0) + 1
      assert(edgeCount(key) <= 2, s"$label: edge $key shared 3+ times")
    }
    // 4. Euler: T = 2n - 2 - h (h = hull points incl. collinear ones);
    //    check via boundary edge count == hull point count
    val hullEdges = edgeCount.count(_._2 == 1)
    assert(nT == 2 * n - 2 - hullEdges,
      s"$label: Euler mismatch nT=$nT n=$n hullEdges=$hullEdges")
    // 5. adjacency: mutual, edge-sharing, boundary iff -1
    for (i <- 0 until nT; e <- 0 until 3) {
      val o = tr.adj(3 * i + e)
      val u = t(3 * i + (e + 1) % 3); val w = t(3 * i + (e + 2) % 3)
      val key = (math.min(u, w), math.max(u, w))
      if (o >= 0) {
        assert((0 until 3).exists(j => tr.adj(3 * o + j) == i),
          s"$label: adjacency not mutual t=$i o=$o")
        val ovs = Set(t(3 * o), t(3 * o + 1), t(3 * o + 2))
        assert(ovs.contains(u) && ovs.contains(w),
          s"$label: neighbor $o does not share edge $key of $i")
        assert(edgeCount(key) == 2, s"$label: adj set but edge $key count != 2")
      } else {
        assert(edgeCount(key) == 1, s"$label: adj -1 but edge $key count != 1")
      }
    }
    // 6. union area == convex hull area
    val triArea = (0 until nT).map { i =>
      val (a, b, c) = (t(3 * i), t(3 * i + 1), t(3 * i + 2))
      ((tr.xs(b) - tr.xs(a)) * (tr.ys(c) - tr.ys(a)) -
       (tr.ys(b) - tr.ys(a)) * (tr.xs(c) - tr.xs(a))) / 2.0
    }.sum
    val hull = Algos.convexHull(GMPoint(
      (0 until n).map(i => GPoint(Array(tr.xs(i), tr.ys(i)), CT.XY)).toArray, CT.XY))
    val hullArea = Measure.area(hull)
    assert(math.abs(triArea - hullArea) <= 1e-9 * math.max(1.0, hullArea),
      s"$label: triangle union $triArea != hull area $hullArea")
  }

  test("random integer point sets (heavy cocircular ties)") {
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(seed)
      val n = 3 + rnd.nextInt(120)
      val xs = Array.fill(n)(rnd.nextInt(12).toDouble)
      val ys = Array.fill(n)(rnd.nextInt(12).toDouble)
      validate(xs, ys, s"int seed=$seed n=$n")
    }
  }

  test("random continuous point sets") {
    for (seed <- 1 to 30) {
      val rnd = new scala.util.Random(1000 + seed)
      val n = 3 + rnd.nextInt(200)
      val xs = Array.fill(n)(rnd.nextDouble() * 100 - 50)
      val ys = Array.fill(n)(rnd.nextDouble() * 100 - 50)
      validate(xs, ys, s"cont seed=$seed n=$n")
    }
  }

  test("regular grid (maximal cocircularity)") {
    for (w <- Seq(2, 3, 5, 8); h <- Seq(2, 4, 7)) {
      val pts = for (i <- 0 until w; j <- 0 until h) yield (i.toDouble, j.toDouble)
      validate(pts.map(_._1).toArray, pts.map(_._2).toArray, s"grid ${w}x$h")
    }
  }

  test("collinear prefixes and degenerate inputs") {
    validate(Array(0.0, 1, 2, 3), Array(0.0, 0, 0, 0), "all collinear")
    validate(Array(0.0, 1, 2, 3, 1.5), Array(0.0, 0, 0, 0, 2), "collinear + apex")
    validate(Array(0.0, 0, 0, 0, 5), Array(0.0, 1, 2, 3, 1.5), "vertical collinear + apex")
    validate(Array(1.0, 1, 1), Array(2.0, 2, 2), "single dup point")
    validate(Array(0.0, 0, 1, 1, 0.5), Array(0.0, 1, 0, 1, 0.5), "square + center")
    // points on a circle (exactly cocircular quads via symmetry)
    val circ = (0 until 12).map { k =>
      (math.cos(2 * math.Pi * k / 12), math.sin(2 * math.Pi * k / 12))
    }
    validate(circ.map(_._1).toArray, circ.map(_._2).toArray, "12 on circle")
  }

  test("clustered duplicates and near-duplicates") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(7000 + seed)
      val n = 50
      val xs = new Array[Double](n); val ys = new Array[Double](n)
      for (i <- 0 until n) {
        if (i > 0 && rnd.nextInt(4) == 0) { xs(i) = xs(rnd.nextInt(i)); ys(i) = ys(rnd.nextInt(i)) }
        else { xs(i) = rnd.nextInt(6).toDouble; ys(i) = rnd.nextInt(6).toDouble }
      }
      validate(xs, ys, s"dups seed=$seed")
    }
  }
}
